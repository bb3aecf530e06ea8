"""Intersection strategy dispatch.

``method``:
- "pallas": fused VMEM-resident brute-force kernel (the fast path — tables
  live on-chip, HBM traffic is per-ray only). Default on TPU for scenes
  whose tables fit comfortably in VMEM; interpret-mode elsewhere;
- "bruteforce": XLA chunk-scanned linear reduction (portable reference
  implementation, used for oracles and CPU tests);
- "leaf": leaf-culled traversal kernel (ops/pallas_bvh.py) — the production
  path for sphere-heavy scenes; requires ``scene.leaf`` tables (attached
  host-side by ops.pallas_bvh.with_leaf_tables);
- "bvh": flat-BVH traversal (wins for large triangle meshes);
- "auto": picks per the rules above at trace time (static shapes — the
  choice is baked into the jitted program).
"""

from __future__ import annotations

from raytracer_tpu.ops.intersect import Hit, intersect_bruteforce
from raytracer_tpu.scene.types import Scene

BVH_AUTO_THRESHOLD = 655360
# Sphere tables cost 68 B/primitive in VMEM (17 f32 component planes); 80k
# primitives ~= 5.6 MB, comfortably inside the ~16 MB budget alongside the
# ray tiles. The distance-ordered chunk walk (pallas_intersect.py round 3)
# keeps per-ray work sublinear on dense fields, and SPHERE tables beyond
# one kernel's VMEM capacity chain Morton-slabbed kernel calls with best_t
# carried as the next slab's t_max (pallas_intersect._run_slabbed) — up to
# 8 slabs (the XLA fallbacks took minutes per cast and killed the device
# at 160k spheres; auto only falls past "pallas" above this cap).
PALLAS_MAX_SPHERES = 655360
# Triangles slab too (TRI_SLAB = 49152 per call, 152 B each); rects have
# no slab path but only ever number in the dozens (boxes expand to 6).
PALLAS_MAX_TRIS = 393216
PALLAS_MAX_RECTS = 81920
PALLAS_MAX_PRIMS = PALLAS_MAX_SPHERES  # back-compat alias (sphere-bound)
# Slab 0 carries min(n_sph, SPH_SLAB) spheres + ALL rects + min(n_tri,
# TRI_SLAB) tris in one kernel's VMEM; the per-table caps alone cannot see
# their combined size (a rect-heavy mixed scene could overflow while every
# individual cap holds). Bytes/prim = 4 * table rows.
SPH_BYTES, RECT_BYTES, TRI_BYTES = 72, 104, 152
SLAB0_TABLE_BUDGET = 14 * 2 ** 20  # ~16 MB VMEM minus ray tiles/outputs


def _resolve(scene: Scene, method: str, has_time: bool = False) -> str:
    # motion blur: the dense kernel tests c + v*t when the caller supplies
    # per-ray times (velocity rows + shutter-dilated culls,
    # pallas_intersect.SPH_VEL_ROW). Without times — or through the leaf /
    # BVH paths, which have no motion support — moving scenes take the XLA
    # brute force (centers at t=0 would otherwise be silently wrong).
    moving = bool(scene.spheres.motion_marker.shape[0])
    if moving and not has_time:
        return "bruteforce"
    if method != "auto":
        if moving and method in ("leaf", "bvh"):
            return "pallas"
        return method
    if moving:
        from raytracer_tpu.ops.pallas_intersect import SPH_SLAB, TRI_SLAB
        n_s = scene.spheres.radius.shape[0]
        n_t = scene.triangles.mat_id.shape[0]
        n_r = scene.rects.k.shape[0]
        # +12 B/sphere: the 3 velocity rows exist only in motion tables
        slab0 = (min(n_s, SPH_SLAB) * (SPH_BYTES + 12) + n_r * RECT_BYTES
                 + min(n_t, TRI_SLAB) * TRI_BYTES)
        if (n_s <= PALLAS_MAX_SPHERES and n_t <= PALLAS_MAX_TRIS
                and n_r <= PALLAS_MAX_RECTS and slab0 <= SLAB0_TABLE_BUDGET):
            return "pallas"
        return "bruteforce"
    # The dense brute-force kernel runs at ~85% of VPU single-issue peak
    # and beats the leaf-culled walk at every measured sphere count (58 vs
    # 40 ms at 1k, 2.2 s vs 0.4 s at 16k per 960k-ray cast — the walk's
    # per-iteration selection cost grows with the leaf count; ROUND_NOTES
    # round 2). "leaf" stays available as an explicit method.
    from raytracer_tpu.ops.pallas_intersect import SPH_SLAB, TRI_SLAB
    n_s = scene.spheres.radius.shape[0]
    n_t = scene.triangles.mat_id.shape[0]
    n_r = scene.rects.k.shape[0]
    slab0_bytes = (min(n_s, SPH_SLAB) * SPH_BYTES + n_r * RECT_BYTES
                   + min(n_t, TRI_SLAB) * TRI_BYTES)
    if (n_s <= PALLAS_MAX_SPHERES and n_t <= PALLAS_MAX_TRIS
            and n_r <= PALLAS_MAX_RECTS
            and slab0_bytes <= SLAB0_TABLE_BUDGET):
        return "pallas"
    if scene.bvh is not None:
        return "bvh"
    return "bruteforce"


def intersect_scene(scene: Scene, o, d, t_min, t_max,
                    method: str = "auto", time=None, alive=None) -> Hit:
    method = _resolve(scene, method, has_time=time is not None)
    if method == "leaf":
        from raytracer_tpu.ops.pallas_bvh import intersect_leaf
        return intersect_leaf(scene, o, d, t_min, t_max, alive=alive)
    if method == "pallas":
        from raytracer_tpu.ops.pallas_intersect import intersect_pallas
        return intersect_pallas(scene, o, d, t_min, t_max, alive=alive,
                                time=time)
    if method == "bvh":
        if scene.bvh is None:
            raise ValueError("scene has no BVH; build it with ops.bvh.build_bvh")
        from raytracer_tpu.ops.bvh import intersect_bvh
        return intersect_bvh(scene, o, d, t_min, t_max)
    return intersect_bruteforce(scene, o, d, t_min, t_max, time=time)


def intersect_and_attrs(scene: Scene, o, d, t_min, t_max,
                        method: str = "auto", time=None, alive=None):
    """Closest hit + HitRecord attributes (+ material features on the pallas
    paths, where the kernel extracts everything in VMEM and shading needs no
    table access). ``alive`` (N,) bool marks lanes the wavefront has retired;
    the leaf kernel skips their traversal work entirely (their results are
    arbitrary and must be masked by the caller, which retired them anyway).
    Returns (hit, attrs, feats-or-None)."""
    from raytracer_tpu.ops.intersect import hit_attributes
    method = _resolve(scene, method, has_time=time is not None)
    if method == "leaf":
        from raytracer_tpu.ops.pallas_bvh import intersect_leaf_full
        return intersect_leaf_full(scene, o, d, t_min, t_max, alive=alive)
    if method == "pallas":
        from raytracer_tpu.ops.pallas_intersect import intersect_pallas_full
        return intersect_pallas_full(scene, o, d, t_min, t_max, alive=alive,
                                     time=time)
    hit = intersect_scene(scene, o, d, t_min, t_max, method, time=time)
    return hit, hit_attributes(scene, o, d, hit, time=time), None

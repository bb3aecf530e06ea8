"""Intersection strategy dispatch.

``method``:
- "bruteforce": linear chunk-scanned reduction over all primitive tables
  (fastest on TPU for small/medium scenes — wide vector lanes beat pointer
  chasing up to thousands of primitives);
- "bvh": flat-BVH traversal (for large triangle meshes);
- "auto": picks by primitive count at trace time (static shapes, so this is
  a Python-level choice baked into the jitted program).
"""

from __future__ import annotations

from raytracer_tpu.ops.intersect import Hit, intersect_bruteforce
from raytracer_tpu.scene.types import Scene

BVH_AUTO_THRESHOLD = 4096


def intersect_scene(scene: Scene, o, d, t_min, t_max,
                    method: str = "auto") -> Hit:
    if method == "auto":
        use_bvh = scene.bvh is not None and scene.n_primitives > BVH_AUTO_THRESHOLD
        method = "bvh" if use_bvh else "bruteforce"
    if method == "bvh":
        if scene.bvh is None:
            raise ValueError("scene has no BVH; build it with ops.bvh.build_bvh")
        from raytracer_tpu.ops.bvh import intersect_bvh
        return intersect_bvh(scene, o, d, t_min, t_max)
    return intersect_bruteforce(scene, o, d, t_min, t_max)

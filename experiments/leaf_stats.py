"""Offline experiment: how much work can a leaf-mask traversal kernel skip
on scene_500-class wavefronts?

Models the planned ops/pallas_bvh.py design:
- spheres with radius > BIG_R go to an always-tested list;
- small spheres are Morton-ordered and grouped into leaves of LEAF spheres;
- per ray: slab-test all leaf AABBs (dense), then test spheres only in hit
  leaves, front-to-back with early exit once leaf.entry > best_t.

Reports per-wavefront: mean/max leaf hits, candidate spheres with and
without early exit, and per-tile (256 sorted rays) iteration counts at
8/16 leaves per iteration (the kernel's lane-packing unit).

Run: python experiments/leaf_stats.py [scene.json]
"""
import json
import sys

import numpy as np

rng = np.random.default_rng(0)

BIG_R = 0.25
N_RAYS = 4096
TILE = 256


def load_spheres(path):
    d = json.load(open(path))
    out = []

    def walk(n):
        if isinstance(n, dict):
            if "radius" in n and "center" in n:
                c = n["center"]
                out.append((c["x"], c["y"], c["z"], n["radius"]))
            for v in n.values():
                walk(v)
        elif isinstance(n, list):
            for x in n:
                walk(x)

    walk(d["objects"])
    a = np.array(out)
    cam = d["camera"]
    lf = np.array([cam["look_from"][k] for k in "xyz"])
    la = np.array([cam["look_at"][k] for k in "xyz"])
    return a[:, :3], a[:, 3], lf, la, cam["vfov"]


def morton(centers):
    lo, hi = centers.min(0), centers.max(0)
    q = np.clip(((centers - lo) / np.maximum(hi - lo, 1e-9) * 1023)
                .astype(np.uint64), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return np.argsort((spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1)
                      | spread(q[:, 2]))


def sphere_hit(c, r, o, d):
    """Closest-hit t per ray over all spheres. o,d (N,3); c (S,3); r (S,)."""
    oc = o[:, None] - c[None]                      # (N,S,3)
    b = np.einsum("nsk,nk->ns", oc, d)
    cterm = np.einsum("nsk,nsk->ns", oc, oc) - r[None] ** 2
    disc = b * b - cterm
    sq = np.sqrt(np.maximum(disc, 0))
    t1 = -b - sq
    t2 = -b + sq
    t = np.where(t1 > 1e-3, t1, np.where(t2 > 1e-3, t2, np.inf))
    t = np.where(disc > 0, t, np.inf)
    return t


def slab(bmin, bmax, o, d, tmax):
    """(N, L) AABB entry distances; inf on miss."""
    inv = 1.0 / np.where(np.abs(d) > 1e-12, d, 1e-12)
    t0 = (bmin[None] - o[:, None]) * inv[:, None]  # (N,L,3)
    t1 = (bmax[None] - o[:, None]) * inv[:, None]
    lo = np.minimum(t0, t1).max(-1)
    hi = np.maximum(t0, t1).min(-1)
    enter = np.maximum(lo, 1e-3)
    ok = (enter <= hi) & (lo <= tmax[:, None])
    return np.where(ok, enter, np.inf)


def stats_for(name, o, d, centers, radii, leaves, LEAF):
    small = radii <= BIG_R
    c_s, r_s = centers[small], radii[small]
    order = morton(c_s)
    c_s, r_s = c_s[order], r_s[order]
    nleaf = -(-len(c_s) // LEAF)
    bmin = np.full((nleaf, 3), np.inf)
    bmax = np.full((nleaf, 3), -np.inf)
    for l in range(nleaf):
        s = slice(l * LEAF, (l + 1) * LEAF)
        bmin[l] = (c_s[s] - r_s[s, None]).min(0)
        bmax[l] = (c_s[s] + r_s[s, None]).max(0)

    # ground truth ts
    t_all = sphere_hit(centers, radii, o, d).min(1)
    t_big = sphere_hit(centers[~small], radii[~small], o, d).min(1)

    entry = slab(bmin, bmax, o, d, np.where(np.isinf(t_all), 1e9, t_all) * 0 + 1e9)
    hitmask = np.isfinite(entry)
    n_hit_leaves = hitmask.sum(1)

    # front-to-back early exit: process leaves in entry order, keep best_t
    ordl = np.argsort(entry, 1)
    entry_sorted = np.take_along_axis(entry, ordl, 1)
    best = t_big.copy()
    used = np.zeros(len(o), np.int64)
    done = np.zeros(len(o), bool)
    for j in range(nleaf):
        e = entry_sorted[:, j]
        live = ~done & np.isfinite(e) & (e < best)
        used += live
        # test this leaf's spheres for live rays
        idx = ordl[live, j]
        if idx.size:
            ts = np.full(len(o), np.inf)
            for l in np.unique(idx):
                rays = np.where(live & (ordl[:, j] == l))[0]
                s = slice(l * LEAF, (l + 1) * LEAF)
                tt = sphere_hit(c_s[s], r_s[s], o[rays], d[rays]).min(1)
                ts[rays] = tt
            best = np.minimum(best, ts)
        done |= ~np.isfinite(e) | (e >= best)
    print(f"  {name:22s} leaves={nleaf:4d} hit-leaves mean={n_hit_leaves.mean():6.2f} "
          f"p95={np.percentile(n_hit_leaves,95):5.1f} max={n_hit_leaves.max():4d} | "
          f"early-exit leaves mean={used.mean():6.2f} p95={np.percentile(used,95):5.1f}")

    # tile iteration counts (sorted rays): iterations = ceil(max-in-tile/k)
    oct_ = (d[:, 0] > 0) * 4 + (d[:, 1] > 0) * 2 + (d[:, 2] > 0)
    m = morton(o)  # morton of origin as secondary key
    rank = np.argsort(oct_ * len(o) + np.argsort(m))
    for k_leaves in (8, 16):
        for label, arr in (("no-ee", n_hit_leaves), ("ee", used)):
            v = arr[rank]
            ntile = len(v) // TILE
            tmax_ = v[:ntile * TILE].reshape(ntile, TILE).max(1)
            iters = np.ceil(tmax_ / k_leaves)
            # unsorted for comparison
            u = arr[:ntile * TILE].reshape(ntile, TILE).max(1)
            iters_u = np.ceil(u / k_leaves)
            print(f"    k={k_leaves:2d} {label:6s}: sorted tile-iters mean="
                  f"{iters.mean():5.2f}  unsorted={iters_u.mean():5.2f}")
    return n_hit_leaves, used


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/scene_500.json"
    centers, radii, lf, la, vfov = load_spheres(path)
    print(f"{len(radii)} spheres, {int((radii > BIG_R).sum())} big")

    # primary rays
    w = (la - lf).astype(np.float64)
    lf = lf.astype(np.float64)
    w /= np.linalg.norm(w)
    u = np.cross([0, 1, 0], w); u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    half = np.tan(np.radians(vfov) / 2)
    n_side = int(np.sqrt(N_RAYS))
    ys, xs = np.meshgrid(np.linspace(-half, half, n_side),
                         np.linspace(-half, half, n_side), indexing="ij")
    d = (w[None] + xs.reshape(-1, 1) * u[None] + ys.reshape(-1, 1) * v[None])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(lf, d.shape).copy()

    for LEAF in (8, 16, 32):
        print(f"LEAF={LEAF}")
        stats_for("primary", o, d, centers, radii, None, LEAF)

        # bounce wavefront: cosine hemisphere at primary hit points
        t = sphere_hit(centers, radii, o, d)
        ti = t.argmin(1); tv = t.min(1)
        hit = np.isfinite(tv)
        p = o[hit] + tv[hit, None] * d[hit]
        n = p - centers[ti[hit]]
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        # cosine hemisphere
        r1, r2 = rng.random(len(p)), rng.random(len(p))
        a_ = np.cross(n, np.array([0.123, 0.456, 0.789])[None])
        a_ /= np.linalg.norm(a_, axis=1, keepdims=True)
        b_ = np.cross(n, a_)
        phi = 2 * np.pi * r1
        sr = np.sqrt(r2)
        d2 = (a_ * (np.cos(phi) * sr)[:, None] + b_ * (np.sin(phi) * sr)[:, None]
              + n * np.sqrt(1 - r2)[:, None])
        o2 = p + 1e-3 * n
        stats_for("bounce-1 (diffuse)", o2, d2, centers, radii, None, LEAF)

        # bounce-2: same from bounce-1 hits
        t = sphere_hit(centers, radii, o2, d2)
        ti = t.argmin(1); tv = t.min(1)
        hit = np.isfinite(tv)
        if hit.sum() > 64:
            p = o2[hit] + tv[hit, None] * d2[hit]
            n = p - centers[ti[hit]]
            n /= np.linalg.norm(n, axis=1, keepdims=True)
            r1, r2 = rng.random(len(p)), rng.random(len(p))
            a_ = np.cross(n, np.array([0.123, 0.456, 0.789])[None])
            a_ /= np.linalg.norm(a_, axis=1, keepdims=True)
            b_ = np.cross(n, a_)
            phi = 2 * np.pi * r1
            sr = np.sqrt(r2)
            d3 = (a_ * (np.cos(phi) * sr)[:, None] + b_ * (np.sin(phi) * sr)[:, None]
                  + n * np.sqrt(1 - r2)[:, None])
            stats_for("bounce-2 (diffuse)", p + 1e-3 * n, d3, centers, radii,
                      None, LEAF)


if __name__ == "__main__":
    main()

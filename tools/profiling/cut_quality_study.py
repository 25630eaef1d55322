"""Offline cut-quality study: midpoint vs binned-SAH cluster cuts.

Predicts (host-side, no chip) the clustered kernel's visit count for both
split rules (scene/clusters.py BDPT_TPU_CLUSTER_BUILD) on real scenes.
The kernel's cost driver is clusters STREAMED PER RAY TILE (BENCH_NOTES
r03: tile divergence, not per-ray crossings), so the study:

  1. builds both cuts,
  2. generates the two ray populations the walk launches see (camera rays
     and one-bounce cosine rays off real first hits),
  3. Morton-sorts them with the production key (ops/intersect._morton_key)
     and counts, per 256-ray tile, the clusters whose AABB any live ray
     segment crosses — the kernel's streamed-visit count,
  4. reports leaf-count / SA-sum / mean+total survivors for each rule.

Usage: JAX_PLATFORMS=cpu python tools/profiling/cut_quality_study.py [ups]
  ups = number of Loop-upsample passes on the bunny (0 = CBbunny 28.5k,
  1 = 114k, 2 = 457k CBlucy stand-in).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

TILE_R = 256
N_TILES = 96


def tile_survivors(clusters, o, d, min_t, max_t):
    """Mean clusters streamed per TILE_R tile (numpy slab tests)."""
    cb = np.asarray(clusters.cluster_b)
    lo, hi = cb[0:3].T, cb[3:6].T          # [C,3]
    fin = np.isfinite(lo[:, 0]) & (lo[:, 0] <= hi[:, 0])
    lo, hi = lo[fin], hi[fin]
    o = np.asarray(o); d = np.asarray(d)
    min_t = np.broadcast_to(np.asarray(min_t), o.shape[:1])
    max_t = np.broadcast_to(np.asarray(max_t), o.shape[:1])
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    totals = []
    for s in range(0, min(len(o), N_TILES * TILE_R), TILE_R):
        ot, it_, mn, mx = o[s:s+TILE_R], inv[s:s+TILE_R], \
            min_t[s:s+TILE_R], max_t[s:s+TILE_R]
        live = mx >= mn
        if not live.any():
            totals.append(0)
            continue
        t0 = (lo[:, None, :] - ot[None]) * it_[None]   # [C,R,3]
        t1 = (hi[:, None, :] - ot[None]) * it_[None]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        cross = (tn <= tf) & (tf >= mn[None]) & (tn <= mx[None]) & live[None]
        totals.append(int(cross.any(axis=1).sum()))
    return float(np.mean(totals)), int(np.sum(totals))


def leaf_metrics(clusters):
    cb = np.asarray(clusters.cluster_b)
    lo, hi = cb[0:3].T, cb[3:6].T
    fin = np.isfinite(lo[:, 0]) & (lo[:, 0] <= hi[:, 0])
    d = np.maximum(hi[fin] - lo[fin], 0)
    sa = (d[:, 0]*d[:, 1] + d[:, 1]*d[:, 2] + d[:, 2]*d[:, 0]).sum()
    return int(fin.sum()), float(sa)


def main():
    ups = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    from bidirectional_pathtracing_tpu.scene.build import load_scene
    from bidirectional_pathtracing_tpu.scene.clusters import build_clusters
    from bidirectional_pathtracing_tpu.ops.intersect import (
        _morton_key, intersect)
    from bidirectional_pathtracing_tpu.ops import camera_ops
    from bidirectional_pathtracing_tpu.core.math import EPS_F, INF_D, \
        make_coord_space, to_world

    w, h = 480, 360
    kw = {}
    if ups:
        kw = dict(mesh_ops=("upsample",) * ups, mesh_ops_min_tris=1000)
    scene, aux = load_scene("/root/reference/dae/sky/CBbunny.dae", w, h, **kw)
    print(f"tris={aux['num_tris']}")

    # ray populations: Morton-tiled camera rays + cosine bounce rays off
    # their real first hits (the walk-launch mix BENCH_NOTES r03 studied)
    n = N_TILES * TILE_R
    rng = np.random.default_rng(0)
    pix = rng.choice(w * h, size=n, replace=False)
    px = (pix % w + 0.5) / w
    py = (pix // w + 0.5) / h
    o_c, d_c = camera_ops.generate_ray(scene.camera, jnp.asarray(px),
                                       jnp.asarray(py))
    hit = intersect(scene.geometry, o_c, d_c, EPS_F, INF_D)
    hp = o_c + hit.t[:, None] * d_c
    u1, u2 = rng.random(n), rng.random(n)
    r = np.sqrt(u1)
    local = jnp.asarray(np.stack([r*np.cos(2*np.pi*u2), r*np.sin(2*np.pi*u2),
                                  np.sqrt(1-u1)], -1), jnp.float32)
    o2w = make_coord_space(hit.n)
    d_b = to_world(o2w, local)
    valid_b = np.asarray(hit.valid)

    rows = {}
    for build in ("midpoint", "sah"):
        for paired in (False, True):
            t0 = time.perf_counter()
            cl = build_clusters(scene.geometry, paired=paired, build=build)
            bt = time.perf_counter() - t0
            nleaf, sa = leaf_metrics(cl)
            # Morton-sort both populations with the production key
            res = {}
            for tag, (o, d, mx) in {
                "cam": (o_c, d_c, np.full(n, np.inf, np.float32)),
                "bounce": (np.asarray(hp), np.asarray(d_b),
                           np.where(valid_b, np.inf, -1.0).astype(
                               np.float32)),
            }.items():
                key = np.asarray(_morton_key(cl, jnp.asarray(o),
                                             jnp.asarray(d)))
                perm = np.argsort(key, kind="stable")
                mean_s, tot = tile_survivors(
                    cl, np.asarray(o)[perm], np.asarray(d)[perm],
                    np.full(n, 1e-4, np.float32)[perm], mx[perm])
                res[tag] = (mean_s, tot)
            lay = "paired" if paired else "flat"
            rows[(build, lay)] = (nleaf, sa, res, bt)
            print(f"{build:9s} {lay:6s}: leaves={nleaf:5d} SAsum={sa:9.1f} "
                  f"build={bt:5.1f}s "
                  f"cam {res['cam'][0]:7.1f}/tile bounce "
                  f"{res['bounce'][0]:7.1f}/tile", flush=True)

    for lay in ("flat", "paired"):
        m, s_ = rows[("midpoint", lay)], rows[("sah", lay)]
        for tag in ("cam", "bounce"):
            dv = 100.0 * (1 - s_[2][tag][1] / max(m[2][tag][1], 1))
            print(f"{lay} {tag}: SAH streams {dv:+.1f}% fewer visits")


if __name__ == "__main__":
    main()

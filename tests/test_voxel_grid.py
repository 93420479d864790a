"""Device voxel-grid downsample vs a numpy reference (PCL centroid semantics)."""
import numpy as np

import jax.numpy as jnp

from fast_lio_tpu.ops.voxel_grid import voxel_downsample

RNG = np.random.default_rng(61)


def numpy_voxel_grid(pts, leaf):
    cells = np.floor(pts / leaf).astype(np.int64)
    out = {}
    for p, c in zip(pts, map(tuple, cells)):
        out.setdefault(c, []).append(p)
    return {c: np.mean(v, axis=0) for c, v in out.items()}


def test_centroids_match_numpy():
    pts = RNG.uniform(-4, 4, (500, 3))
    cents, mask = voxel_downsample(
        jnp.asarray(pts), jnp.ones(500, bool), 0.5, 512
    )
    got = np.asarray(cents)[np.asarray(mask)]
    ref = numpy_voxel_grid(pts, 0.5)
    assert len(got) == len(ref)
    for g in got:
        c = tuple(np.floor(g / 0.5).astype(np.int64))
        assert c in ref
        np.testing.assert_allclose(g, ref[c], atol=1e-6)


def test_mask_respected_and_padding():
    pts = RNG.uniform(-4, 4, (256, 3))
    mask = np.arange(256) < 100
    cents, out_mask = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 0.5, 300)
    ref = numpy_voxel_grid(pts[:100], 0.5)
    assert int(out_mask.sum()) == len(ref)


def test_overflow_drops_extra_voxels():
    # 200 points in 200 distinct voxels but only 64 output slots
    pts = np.arange(200)[:, None] * np.array([[1.0, 0, 0]])
    cents, mask = voxel_downsample(jnp.asarray(pts), jnp.ones(200, bool), 0.5, 64)
    assert int(mask.sum()) == 64


def test_single_voxel():
    pts = RNG.uniform(0.1, 0.4, (50, 3))  # all in voxel (0,0,0) at leaf 0.5
    cents, mask = voxel_downsample(jnp.asarray(pts), jnp.ones(50, bool), 0.5, 16)
    assert int(mask.sum()) == 1
    np.testing.assert_allclose(
        np.asarray(cents)[np.asarray(mask)][0], pts.mean(axis=0), atol=1e-6
    )


def test_fused_key_matches_lexsort():
    """coord_bound fused-key path == exact lexsort path for in-bound points,
    including the intensity channel and the masked/padded rows."""
    pts = RNG.uniform(-30, 30, (800, 3)).astype(np.float32)
    mask = RNG.random(800) < 0.8
    feats = RNG.uniform(0, 255, 800).astype(np.float32)
    a = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 0.5, 512,
                         feats=jnp.asarray(feats))
    b = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 0.5, 512,
                         feats=jnp.asarray(feats), coord_bound=35.0)
    # same voxel set, same centroids, same averaged intensity (order may
    # differ between sort keys -> compare as sorted rows)
    ca = np.asarray(a[0])[np.asarray(a[1])]
    cb = np.asarray(b[0])[np.asarray(b[1])]
    fa = np.asarray(a[2])[np.asarray(a[1])]
    fb = np.asarray(b[2])[np.asarray(b[1])]
    oa = np.lexsort(ca.T)
    ob = np.lexsort(cb.T)
    np.testing.assert_allclose(ca[oa], cb[ob], atol=1e-6)
    np.testing.assert_allclose(fa[oa], fb[ob], atol=1e-4)


def test_fused_key_outlier_does_not_corrupt_inbound_voxels():
    """A point beyond coord_bound (either sign) must only affect itself:
    every in-bound voxel/centroid must still match the exact lexsort path.
    Regression for the data-dependent-origin bug where one far outlier
    shifted the batch-min reference and merged in-bound voxels."""
    pts = RNG.uniform(-30, 30, (800, 3)).astype(np.float32)
    feats = RNG.uniform(0, 255, 800).astype(np.float32)
    for outlier in ([-500.0, 3.0, 3.0], [3.0, 700.0, 3.0], [2.0, 2.0, -900.0]):
        p = pts.copy()
        p[0] = outlier
        a = voxel_downsample(jnp.asarray(p), jnp.ones(800, bool), 0.5, 1024,
                             feats=jnp.asarray(feats))
        b = voxel_downsample(jnp.asarray(p), jnp.ones(800, bool), 0.5, 1024,
                             feats=jnp.asarray(feats), coord_bound=35.0)
        ca = np.asarray(a[0])[np.asarray(a[1])]
        cb = np.asarray(b[0])[np.asarray(b[1])]
        fa = np.asarray(a[2])[np.asarray(a[1])]
        fb = np.asarray(b[2])[np.asarray(b[1])]
        # drop the outlier's own voxel from each side (clamped in b), then
        # the in-bound voxel sets and centroids must agree exactly
        in_a = np.all(np.abs(ca) <= 35.0, axis=1)
        in_b = np.all(np.abs(cb) <= 35.0, axis=1)
        ca, fa = ca[in_a], fa[in_a]
        cb, fb = cb[in_b], fb[in_b]
        assert len(ca) == len(cb)
        oa, ob = np.lexsort(ca.T), np.lexsort(cb.T)
        np.testing.assert_allclose(ca[oa], cb[ob], atol=1e-6)
        np.testing.assert_allclose(fa[oa], fb[ob], atol=1e-4)


def test_fused_key_falls_back_when_bits_overflow():
    # coord_bound huge at a tiny leaf -> 3*bits > 30 -> exact lexsort path
    pts = RNG.uniform(-400, 400, (300, 3)).astype(np.float32)
    a = voxel_downsample(jnp.asarray(pts), jnp.ones(300, bool), 0.1, 300)
    b = voxel_downsample(jnp.asarray(pts), jnp.ones(300, bool), 0.1, 300,
                         coord_bound=500.0)
    ca = np.asarray(a[0])[np.asarray(a[1])]
    cb = np.asarray(b[0])[np.asarray(b[1])]
    np.testing.assert_allclose(ca[np.lexsort(ca.T)], cb[np.lexsort(cb.T)],
                               atol=1e-6)


def test_two_key_path_matches_exact_lexsort_at_det_range_450():
    """det_range-450-class coord_bound (36 key bits) takes the r5 two-key
    path; voxels/centroids/intensity must match the exact 3-key lexsort."""
    import numpy as np

    import jax.numpy as jnp

    from fast_lio_tpu.ops.voxel_grid import voxel_downsample

    rng = np.random.default_rng(45)
    n = 4096
    pts = rng.uniform(-560, 560, (n, 3)).astype(np.float32)
    # out-of-bound outliers on each axis/sign: per contract they clamp to
    # the boundary voxel (affecting only themselves) and must not perturb
    # any in-bound voxel
    pts[0] = [2000.0, 0.0, 0.0]
    pts[1] = [0.0, -2000.0, 0.0]
    pts[2] = [0.0, 0.0, 2000.0]
    pts = jnp.asarray(pts)
    mask = jnp.asarray(rng.random(n) < 0.9)
    feats = jnp.asarray(rng.random(n), jnp.float32)
    leaf, n_out = 0.5, 4096
    bound = 450.0 * 1.25 + 5.0  # the production avia preset's bound

    c2, m2, f2 = voxel_downsample(pts, mask, leaf, n_out, feats=feats,
                                  coord_bound=bound)
    ce, me, fe = voxel_downsample(pts, mask, leaf, n_out, feats=feats,
                                  coord_bound=None)  # exact lexsort

    # in-bound set equality (emission order may differ between key layouts)
    def canon(c, m, f):
        c, m, f = np.asarray(c), np.asarray(m), np.asarray(f)
        keep = m & (np.abs(c) <= bound).all(axis=1)
        rows = np.concatenate([c[keep], f[keep][:, None]], axis=1)
        return rows[np.lexsort(rows.T[::-1])]

    np.testing.assert_allclose(canon(c2, m2, f2), canon(ce, me, fe),
                               rtol=0, atol=1e-5)

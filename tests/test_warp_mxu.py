"""Gather-free MXU warp backend vs the gather reference backend.

Device profiling (RESULTS.md round 2) showed the gather warp consuming 85%
of the real train step on TPU (SparseCore offload); `data/warp_mxu.py`
replaces it with separable interpolation matmuls + Paeth 3-shear rotation.
Without rotation the two backends are bit-equivalent (same 2-tap weights);
with rotation the 3-shear filter differs slightly from single-pass bilinear
(documented deviation) — tested here with tolerance bounds.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcl_tpu.data.augment import (AugmentPolicy, apply_geometric,
                                   augment_twice, sample_geometric)

B, S = 4, 64


@pytest.fixture(scope="module")
def data():
    yy, xx = np.mgrid[0:S, 0:S]
    img = np.stack([(np.sin(yy / 7.0 + b) * np.cos(xx / 5.0) * 0.5 + 0.5)
                    for b in range(B)]).astype(np.float32)[..., None]
    lab = ((yy[None] - 32) ** 2 + (xx[None] - 32) ** 2
           < (10 + np.arange(B)[:, None, None]) ** 2).astype(np.int32)
    sizes = np.asarray([[64, 64], [48, 40], [56, 64], [40, 40]], np.int32)
    for b, (h, w) in enumerate(sizes):
        m = np.zeros((S, S), bool)
        oy, ox = (S - h) // 2, (S - w) // 2
        m[oy:oy + h, ox:ox + w] = True
        img[b][~m] = 0
        lab[b][~m] = 0
    return jnp.asarray(img), jnp.asarray(lab), jnp.asarray(sizes)


def _both(img, lab, params, crop, rac, max_deg):
    g = apply_geometric(img, lab, params, crop, rac, max_deg, backend="gather")
    m = apply_geometric(img, lab, params, crop, rac, max_deg, backend="mxu")
    return g, m


def test_mxu_exact_without_rotation(data):
    """resize + flips + crop: the separable matmuls ARE single-pass bilinear."""
    img, lab, sizes = data
    pol = AugmentPolicy(crop=32, resize=32, rot_degrees=0.0, hflip=True,
                        vflip=True, crop_padding=4, jitter=False)
    params = sample_geometric(jax.random.PRNGKey(1), B, pol, S, sizes)
    (ig, lg), (im, lm) = _both(img, lab, params, 32, False, 0.0)
    np.testing.assert_allclose(np.asarray(ig), np.asarray(im), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lm))


def test_mxu_exact_center_crop_no_sizes(data):
    img, lab, _ = data
    pol = AugmentPolicy(crop=48, rot_degrees=0.0, hflip=False, vflip=False, jitter=False)
    params = sample_geometric(jax.random.PRNGKey(4), B, pol, S)
    (ig, lg), (im, lm) = _both(img, lab, params, 48, False, 0.0)
    np.testing.assert_allclose(np.asarray(ig), np.asarray(im), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lm))


def test_mxu_rotation_close_to_gather(data):
    """3-shear vs single-pass bilinear: small filter difference, aligned
    geometry (label boundary disagreement only)."""
    img, lab, sizes = data
    pol = AugmentPolicy(crop=32, rot_degrees=20.0, hflip=True, vflip=True, jitter=False)
    params = sample_geometric(jax.random.PRNGKey(2), B, pol, S, sizes)
    (ig, lg), (im, lm) = _both(img, lab, params, 32, False, 20.0)
    assert float(jnp.abs(ig - im).mean()) < 0.005
    assert float((lg != lm).mean()) < 0.03


def test_mxu_45deg_no_edge_wedges(data):
    """ADVICE round 2: intermediate shear coordinates leaving the working
    buffer used to zero-fill ~3% of output pixels at 45 deg (wedges along the
    frame edges). The padded buffer must return real image data wherever the
    gather reference does."""
    img, lab, _ = data
    pol = AugmentPolicy(crop=S, rot_degrees=45.0, hflip=False, vflip=False, jitter=False)
    params = sample_geometric(jax.random.PRNGKey(7), B, pol, S)
    (ig, _), (im, _) = _both(img, None, params, S, False, 45.0)
    ig, im = np.asarray(ig), np.asarray(im)
    wedge = ((np.abs(im) < 1e-6) & (np.abs(ig) > 0.05)).sum()
    assert wedge == 0, f"{wedge} zero-filled pixels where gather has data"
    assert float(np.abs(ig - im).mean()) < 0.005


def test_mxu_rotate_after_crop_close(data):
    img, lab, sizes = data
    pol = AugmentPolicy(crop=32, rot_degrees=30.0, rotate_after_crop=True,
                        hflip=False, vflip=False, jitter=False)
    params = sample_geometric(jax.random.PRNGKey(3), B, pol, S, sizes)
    (ig, lg), (im, lm) = _both(img, lab, params, 32, True, 30.0)
    assert float(jnp.abs(ig - im).mean()) < 0.04
    assert float((lg != lm).mean()) < 0.03


def test_rac_corners_zero_filled(data):
    """Reference Compose([RandomCrop, RandomRotation]) rotates the
    MATERIALIZED patch: rotated-in corners are fill=0 in BOTH backends (the
    gather path must not leak image data from beyond the crop)."""
    img, lab, sizes = data
    ones = jnp.ones_like(img)
    params = {"theta": jnp.full((B,), jnp.pi / 4), "fh": jnp.zeros((B,), bool),
              "fv": jnp.zeros((B,), bool), "cy": jnp.full((B,), 10.0),
              "cx": jnp.full((B,), 10.0), "rh": jnp.full((B,), float(S)),
              "rw": jnp.full((B,), float(S)), "oh": jnp.full((B,), float(S)),
              "ow": jnp.full((B,), float(S))}
    for backend in ("gather", "mxu"):
        out, _ = apply_geometric(ones, None, params, 32, True, 45.0, backend=backend)
        corners = np.asarray(out)[:, 0, 0, 0], np.asarray(out)[:, -1, -1, 0]
        assert max(float(c.max()) for c in corners) < 0.05, backend


def test_mxu_inside_augment_twice(data):
    """End-to-end through the public API with an explicit backend override."""
    import spcl_tpu.data.augment as aug
    img, lab, sizes = data
    pol = AugmentPolicy(crop=32, rot_degrees=10.0, jitter=True,
                        brightness=(0.9, 1.1), contrast=(0.9, 1.1))
    orig = aug._warp_backend
    aug._warp_backend = lambda b: "mxu"
    try:
        (i1, l1), (i2, l2) = augment_twice(jax.random.PRNGKey(5), img, lab, pol,
                                           total_freedom=False, sizes=sizes)
    finally:
        aug._warp_backend = orig
    assert i1.shape == (B, 32, 32, 1) and l1.shape == (B, 32, 32)
    assert np.isfinite(np.asarray(i1)).all()
    # total_freedom=False: shared geometry -> labels identical across views
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_blocked_warp_identical(monkeypatch):
    """Batch-blocked dispatch (apply_geometric at B > SPCL_WARP_BLOCK) is the
    identity transform on results: lax.map over <=block-view chunks runs the
    same per-sample math."""
    bb, s = 12, 32
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(bb, s, s, 1).astype(np.float32))
    lab = jnp.asarray((rng.rand(bb, s, s) * 3).astype(np.int32))
    pol = AugmentPolicy(crop=24, rot_degrees=30.0, hflip=True, jitter=False)
    params = sample_geometric(jax.random.PRNGKey(2), bb, pol, s, None)
    monkeypatch.setenv("SPCL_WARP_BLOCK", "0")
    i0, l0 = apply_geometric(img, lab, params, 24, False, 30.0, backend="mxu")
    monkeypatch.setenv("SPCL_WARP_BLOCK", "4")  # 12 views -> 3 blocks
    i1, l1 = apply_geometric(img, lab, params, 24, False, 30.0, backend="mxu")
    np.testing.assert_allclose(np.asarray(i0), np.asarray(i1), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    # label-less path (pretrain views)
    monkeypatch.setenv("SPCL_WARP_BLOCK", "0")
    j0, n0 = apply_geometric(img, None, params, 24, False, 30.0, backend="mxu")
    monkeypatch.setenv("SPCL_WARP_BLOCK", "4")
    j1, n1 = apply_geometric(img, None, params, 24, False, 30.0, backend="mxu")
    assert n0 is None and n1 is None
    np.testing.assert_allclose(np.asarray(j0), np.asarray(j1), rtol=1e-6, atol=1e-6)
    # indivisible batch falls back to the unblocked path
    monkeypatch.setenv("SPCL_WARP_BLOCK", "5")
    i2, _ = apply_geometric(img, lab, params, 24, False, 30.0, backend="mxu")
    np.testing.assert_allclose(np.asarray(i0), np.asarray(i2), rtol=1e-6, atol=1e-6)


def test_blocked_warp_indivisible_divisor_fallback(monkeypatch):
    """b not divisible by the block: blocking engages at the largest divisor
    <= block instead of silently running unblocked (ADVICE r4); results are
    identical either way. A prime batch (no divisor >= 8) skips blocking."""
    s = 32
    rng = np.random.RandomState(1)
    pol = AugmentPolicy(crop=24, rot_degrees=30.0, hflip=True, jitter=False)
    for bb in (24, 13):  # 24 @ blk16 -> blocks of 12; 13 is prime -> unblocked
        img = jnp.asarray(rng.rand(bb, s, s, 1).astype(np.float32))
        lab = jnp.asarray((rng.rand(bb, s, s) * 3).astype(np.int32))
        params = sample_geometric(jax.random.PRNGKey(3), bb, pol, s, None)
        monkeypatch.setenv("SPCL_WARP_BLOCK", "0")
        i0, l0 = apply_geometric(img, lab, params, 24, False, 30.0, backend="mxu")
        monkeypatch.setenv("SPCL_WARP_BLOCK", "16")
        i1, l1 = apply_geometric(img, lab, params, 24, False, 30.0, backend="mxu")
        np.testing.assert_allclose(np.asarray(i0), np.asarray(i1), rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcl_tpu.models import (
    UNet, ProjectionHead, DenseProjectionHead, ClusterHead, DenseClusterHead,
    Discriminator, ema_update, stage_trainable_mask, zero_grads_by_mask,
    stages_from_range, sort_arch, get_channel_dim,
)
from spcl_tpu.models.heads import adaptive_avg_pool, _adaptive_pool_matrix


@pytest.fixture(scope="module")
def unet_vars():
    model = UNet(input_dim=1, num_classes=4, max_channel=128)
    x = jnp.zeros((2, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_unet_full_forward_shapes(unet_vars):
    model, variables = unet_vars
    x = jnp.ones((2, 64, 64, 1))
    acts = model.apply(variables, x, train=False)
    assert acts["logits"].shape == (2, 64, 64, 4)
    assert acts["Conv5"].shape == (2, 4, 4, 128)
    assert acts["Up_conv2"].shape == (2, 64, 64, 8)


def test_unet_until_partial_forward(unet_vars):
    model, variables = unet_vars
    x = jnp.ones((2, 64, 64, 1))
    acts = model.apply(variables, x, train=False, until="Conv5")
    assert set(acts) == {"Conv1", "Conv2", "Conv3", "Conv4", "Conv5"}
    # partial forward must agree with the prefix of the full forward
    full = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(acts["Conv5"]), np.asarray(full["Conv5"]), rtol=1e-6)


def test_unet_train_updates_batch_stats(unet_vars):
    model, variables = unet_vars
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 1))
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    old = variables["batch_stats"]["Conv1"]["bn0"]["mean"]
    new = updates["batch_stats"]["Conv1"]["bn0"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_channel_dims():
    assert get_channel_dim("Conv1", max_channel=256) == 16
    assert get_channel_dim("Conv5", max_channel=256) == 256
    assert get_channel_dim("Up_conv2", max_channel=256) == 16
    assert get_channel_dim("Deconv_1x1", max_channel=256, num_classes=4) == 4


def test_sort_arch_and_ranges():
    assert sort_arch(["Up_conv3", "Conv5", "Conv2"]) == ["Conv2", "Conv5", "Up_conv3"]
    assert stages_from_range("Conv5", "Conv5") == ["Conv5"]
    assert stages_from_range("Conv5", None, include_start=False)[0] == "Up5"
    assert stages_from_range(None, "Conv2") == ["Conv1", "Conv2"]


def test_stage_mask_freezes_grads(unet_vars):
    model, variables = unet_vars
    params = variables["params"]
    # freeze everything after Conv5 (encoder-pretrain setup)
    frozen = stages_from_range("Conv5", None, include_start=False)
    trainable = [s for s in stages_from_range() if s not in frozen]
    mask = stage_trainable_mask(params, trainable)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    masked = zero_grads_by_mask(grads, mask)
    assert np.all(np.asarray(masked["Up_conv2"]["conv0"]["kernel"]) == 0)
    assert np.all(np.asarray(masked["Conv5"]["conv0"]["kernel"]) == 1)
    assert np.all(np.asarray(masked["Deconv_1x1"]["kernel"]) == 0)


def test_adaptive_avg_pool_matches_torch_bins():
    # torch AdaptiveAvgPool2d(10) on size 56: bins of width 5/6
    mat = _adaptive_pool_matrix(56, 10)
    assert mat.shape == (10, 56)
    np.testing.assert_allclose(mat.sum(1), np.ones(10), rtol=1e-6)
    # compare against a brute-force torch-convention pooling
    x = np.random.rand(1, 56, 56, 3).astype(np.float32)
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), (10, 10)))
    for i in range(10):
        hs, he = int(np.floor(i * 56 / 10)), int(np.ceil((i + 1) * 56 / 10))
        for j in range(10):
            ws, we = int(np.floor(j * 56 / 10)), int(np.ceil((j + 1) * 56 / 10))
            want = x[:, hs:he, ws:we, :].mean(axis=(1, 2))
            np.testing.assert_allclose(got[:, i, j, :], want, rtol=1e-5)


def test_projection_head_normalized():
    head = ProjectionHead(output_dim=32, hidden_dim=32)
    feats = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 7, 16))
    variables = head.init(jax.random.PRNGKey(1), feats)
    z = head.apply(variables, feats)
    assert z.shape == (4, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=1), np.ones(4), rtol=1e-5)


def test_dense_projection_head():
    head = DenseProjectionHead(output_dim=16, spatial_size=(5, 5))
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 28, 28, 8))
    variables = head.init(jax.random.PRNGKey(1), feats)
    z = head.apply(variables, feats)
    assert z.shape == (2, 5, 5, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1),
                               np.ones((2, 5, 5)), rtol=1e-5)


def test_cluster_heads():
    head = ClusterHead(num_clusters=5, num_subheads=3)
    feats = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 7, 16))
    variables = head.init(jax.random.PRNGKey(1), feats)
    probs = head.apply(variables, feats)
    assert probs.shape == (3, 4, 5)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), np.ones((3, 4)), rtol=1e-5)

    dhead = DenseClusterHead(num_clusters=4, num_subheads=2)
    dvars = dhead.init(jax.random.PRNGKey(2), feats)
    dprobs = dhead.apply(dvars, feats)
    assert dprobs.shape == (2, 4, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(dprobs).sum(-1), np.ones((2, 4, 7, 7)), rtol=1e-5)


def test_discriminator():
    d = Discriminator(base_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 64, 64, 4))
    variables = d.init(jax.random.PRNGKey(1), x)
    out = d.apply(variables, x)
    assert out.shape == (3,)


def test_ema_update():
    t = {"w": jnp.ones((2, 2))}
    s = {"w": jnp.zeros((2, 2))}
    out = ema_update(t, s, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9 * np.ones((2, 2)), rtol=1e-6)


def test_nchw_small_c_layout_matches_nhwc():
    """small_c_layout="nchw" (stages 1-2 channels-second — the TPU layout
    that keeps W, not the lane-padded batch, minor; profiled round 3) is a
    pure LAYOUT change: same param tree, same outputs, same batch stats,
    same gradients."""
    import jax.tree_util as jtu
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 1).astype(np.float32))
    m1 = UNet(input_dim=1, num_classes=4, max_channel=128)
    m2 = UNet(input_dim=1, num_classes=4, max_channel=128, small_c_layout="nchw")
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    assert jtu.tree_structure(v1) == jtu.tree_structure(v2)
    o1 = m1.apply(v1, x, train=False)
    o2 = m2.apply(v1, x, train=False)  # the SAME params through the nchw path
    np.testing.assert_allclose(np.asarray(o1["logits"]), np.asarray(o2["logits"]),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(o1["Conv1"]), np.asarray(o2["Conv1"]),
                               atol=3e-5)
    _, mut1 = m1.apply(v1, x, train=True, mutable=["batch_stats"])
    _, mut2 = m2.apply(v1, x, train=True, mutable=["batch_stats"])
    for a, b in zip(jtu.tree_leaves(mut1), jtu.tree_leaves(mut2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def loss(m, v):
        return jnp.sum(m.apply(v, x, train=True, mutable=["batch_stats"])[0]["logits"] ** 2)

    g1 = jax.grad(lambda v: loss(m1, v))(v1)
    g2 = jax.grad(lambda v: loss(m2, v))(v1)
    for a, b in zip(jtu.tree_leaves(g1), jtu.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_packed_small_c_layout_matches_nhwc():
    """small_c_layout="packed" (stages 1-2 on [B,H,W*C/128,128] lane-packed
    activations with banded-matmul convs — experimental/packed_stage.py) must be a
    drop-in: same param tree, EXACT eval-mode forward, train-mode
    forward/stats equal to reorder noise (train BN chains amplify float
    accumulation-order differences; eval mode is the exactness check)."""
    import jax.tree_util as jtu
    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 1).astype(np.float32))
    m1 = UNet(input_dim=1, num_classes=4, max_channel=128)
    m2 = UNet(input_dim=1, num_classes=4, max_channel=128, small_c_layout="packed")
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    assert jtu.tree_structure(v1) == jtu.tree_structure(v2)
    o1 = m1.apply(v1, x, train=False)
    o2 = m2.apply(v1, x, train=False)  # the SAME params through the packed path
    for k in ("Conv1", "Conv2", "logits"):
        np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o2[k]), atol=3e-6)
    a1, mut1 = m1.apply(v1, x, train=True, mutable=["batch_stats"])
    a2, mut2 = m2.apply(v1, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(a1["logits"]), np.asarray(a2["logits"]),
                               atol=2e-3)
    for a, b in zip(jtu.tree_leaves(mut1), jtu.tree_leaves(mut2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # gradients agree to BN-train chaos tolerance (~1% of scale)
    def loss(m, v):
        return jnp.mean(m.apply(v, x, train=True, mutable=["batch_stats"])[0]["logits"] ** 2)

    g1 = jtu.tree_leaves_with_path(jax.grad(lambda v: loss(m1, v))(v1))
    g2 = jtu.tree_leaves_with_path(jax.grad(lambda v: loss(m2, v))(v1))
    for (p, a), (_, b) in zip(g1, g2):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=5e-2, err_msg=jtu.keystr(p))


def test_packed_until_and_partial_shapes():
    """packed path honors until= early exit and non-224 crops (48: W*C=768)."""
    x = jnp.zeros((2, 64, 64, 1), jnp.float32)
    m = UNet(input_dim=1, num_classes=4, max_channel=128, small_c_layout="packed")
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    acts = m.apply(v, x, train=False, until="Conv2")
    assert set(acts) == {"Conv1", "Conv2"}
    assert acts["Conv1"].shape == (2, 64, 64, 8)
    assert acts["Conv2"].shape == (2, 32, 32, 16)
    # non-packable shapes silently fall back to the NHWC path (same params)
    x48 = jnp.zeros((2, 48, 48, 1), jnp.float32)
    acts48 = m.apply(v, x48, train=False)
    assert acts48["logits"].shape == (2, 48, 48, 4)


def test_pallas_small_c_layout_matches_nhwc():
    """small_c_layout="pallas" (fused lane-packed stage kernels,
    experimental/packed_block_pallas; interpret mode on CPU): same param tree, exact
    eval fallback, train forward/stats to reorder noise, and region-local
    gradients to ~1e-4 relative (full-depth grad comparisons are meaningless
    here: a 1e-5 input perturbation alone shifts deep-layer train-BN grads
    of this net by ~10% — measured; the kernels' own backward is verified
    against an autodiff oracle in test_experimental_packed.py)."""
    import jax.tree_util as jtu
    x = jnp.asarray(np.random.RandomState(5).rand(2, 64, 64, 1).astype(np.float32))
    m1 = UNet(input_dim=1, num_classes=4, max_channel=128)
    m2 = UNet(input_dim=1, num_classes=4, max_channel=128, small_c_layout="pallas")
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    assert jtu.tree_structure(v1) == jtu.tree_structure(v2)
    # eval falls back to the plain path: bitwise
    o1 = m1.apply(v1, x, train=False)
    o2 = m2.apply(v1, x, train=False)
    np.testing.assert_array_equal(np.asarray(o1["logits"]), np.asarray(o2["logits"]))
    # train forward + running stats
    a1, mut1 = m1.apply(v1, x, train=True, mutable=["batch_stats"])
    a2, mut2 = m2.apply(v1, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(a1["logits"]), np.asarray(a2["logits"]),
                               atol=2e-3)
    for a, b in zip(jtu.tree_leaves(mut1), jtu.tree_leaves(mut2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    # region-local gradients: loss on the encoder stage outputs
    def loss(m, v):
        acts, _ = m.apply(v, x, train=True, mutable=["batch_stats"], until="Conv3")
        return (jnp.mean(acts["Conv1"] ** 2) + jnp.mean(acts["Conv2"] ** 2)
                + jnp.mean(acts["Conv3"] ** 2))

    g1 = jtu.tree_leaves_with_path(jax.grad(lambda v: loss(m1, v))(v1))
    g2 = jtu.tree_leaves_with_path(jax.grad(lambda v: loss(m2, v))(v1))
    for (p, a), (_, b) in zip(g1, g2):
        s = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=2e-4, err_msg=jtu.keystr(p))

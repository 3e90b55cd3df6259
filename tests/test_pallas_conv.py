"""CHW-lanes Pallas conv kernel tests (interpret mode on the CPU backend).

Validates ops/pallas_conv.py against stock lax.conv_general_dilated for the
small-channel 3x3 SAME stages of the cooperative conv stack
(medseg/models/ebm/encoder_decoder.py:19-348 re-designed in models/blocks.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv import (
    chw_to_nhwc,
    conv3x3_chw,
    conv3x3_nhwc_via_chw,
    nhwc_to_chw,
    weights_to_wall,
)


def _stock(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("h,cin,cout", [
    (16, 16, 16),    # chunkless (H*W = 256 lanes)
    (32, 16, 32),    # 1024 lanes
    (16, 3, 8),      # non-pow2 C_in
    (48, 16, 16),    # chunked path (2304 lanes -> chunk split)
])
def test_matches_stock_conv(h, cin, cout, np_rng):
    x = jnp.asarray(np_rng.randn(2, h, h, cin).astype(np.float32))
    w = jnp.asarray(0.2 * np_rng.randn(3, 3, cin, cout).astype(np.float32))
    got = conv3x3_nhwc_via_chw(x, w, interpret=True)
    want = _stock(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_zero_padding_at_edges(np_rng):
    # an all-ones input with an all-ones kernel counts the in-bounds taps:
    # corners see 4, edges 6, interior 9 — SAME zero-padding semantics
    h, c = 16, 4
    x = jnp.ones((1, h, h, c), jnp.float32)
    w = jnp.ones((3, 3, c, 1), jnp.float32)
    out = np.asarray(conv3x3_nhwc_via_chw(x, w, interpret=True))[0, :, :, 0]
    assert out[0, 0] == 4 * c and out[0, -1] == 4 * c
    assert out[0, 5] == 6 * c and out[5, 0] == 6 * c
    assert out[7, 7] == 9 * c


def test_layout_round_trip(np_rng):
    x = jnp.asarray(np_rng.randn(3, 8, 8, 5).astype(np.float32))
    back = chw_to_nhwc(nhwc_to_chw(x), 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_weights_to_wall_layout(np_rng):
    w = jnp.asarray(np_rng.randn(3, 3, 4, 6).astype(np.float32))
    wall = np.asarray(weights_to_wall(w))
    assert wall.shape == (6, 36)
    for t in range(9):
        ki, kj = divmod(t, 3)
        np.testing.assert_array_equal(wall[:, t * 4:(t + 1) * 4],
                                      np.asarray(w)[ki, kj].T)


@pytest.mark.parametrize("vjp_backend", ["pallas", "stock", "hybrid"])
def test_custom_vjp_matches_stock_grads(monkeypatch, np_rng, vjp_backend):
    """All VJP routes — the Pallas dx/dw kernels, the stock lax.conv
    backward on the NCHW view, and the hybrid (Pallas dx + stock dw)
    (PALLAS_VJP) — must match jax.grad of the stock conv."""
    monkeypatch.setenv("PALLAS_VJP", vjp_backend)
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv import (
        conv3x3_nhwc_ad,
    )
    x = jnp.asarray(np_rng.randn(3, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(0.2 * np_rng.randn(3, 3, 8, 12).astype(np.float32))
    cot = jnp.asarray(np_rng.randn(3, 16, 16, 12).astype(np.float32))

    def loss_pallas(x, w):
        return jnp.sum(conv3x3_nhwc_ad(x, w, interpret=True) * cot)

    def loss_stock(x, w):
        return jnp.sum(_stock(x, w) * cot)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_s, gw_s = jax.grad(loss_stock, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s),
                               rtol=1e-4, atol=2e-3)


def test_chw_entry_point_matches_nhwc(np_rng):
    x = jnp.asarray(np_rng.randn(2, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(0.2 * np_rng.randn(3, 3, 8, 8).astype(np.float32))
    via_chw = conv3x3_chw(nhwc_to_chw(x), w, H=16, W=16, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(chw_to_nhwc(via_chw, 16, 16)),
        np.asarray(conv3x3_nhwc_via_chw(x, w, interpret=True)))


def _run_block(module, x, train, rngs_key=0):
    import flax
    variables = module.init(jax.random.PRNGKey(rngs_key), x, train=False)
    out, mut = module.apply(variables, x, train=train,
                            mutable=["batch_stats"] if train else [])
    return variables, out, (mut.get("batch_stats") if train else None)


@pytest.mark.parametrize("train", [False, True])
def test_fused_chw_res_core_matches_stock(monkeypatch, np_rng, train):
    """The CHW-resident fused _ResCore/ConvBlock paths (PALLAS_CONV_INTERPRET
    forces them on CPU) must match the stock NHWC path: same param tree,
    same outputs, same emitted batch_stats."""
    from cooperative_training_and_latent_space_data_augmentation_tpu.models import (
        blocks,
    )

    x = jnp.asarray(np_rng.randn(2, 16, 16, 8).astype(np.float32))
    for cls, kwargs in ((blocks._ResCore, dict(features=16)),
                        (blocks.ConvBlock, dict(features=16))):
        module = cls(**kwargs)
        monkeypatch.delenv("PALLAS_CONV_INTERPRET", raising=False)
        assert not blocks._fused_chw_ok(x, 16) or jax.default_backend() == "tpu"
        v_stock, out_stock, bs_stock = _run_block(module, x, train)
        monkeypatch.setenv("PALLAS_CONV_INTERPRET", "1")
        assert blocks._fused_chw_ok(x, 16)
        v_fused, out_fused, bs_fused = _run_block(module, x, train)
        # identical parameter trees (names AND shapes): checkpoints are
        # layout-oblivious
        assert jax.tree_util.tree_structure(v_stock) == \
            jax.tree_util.tree_structure(v_fused)
        np.testing.assert_allclose(np.asarray(out_fused),
                                   np.asarray(out_stock),
                                   rtol=2e-5, atol=2e-5)
        if train:
            for a, b in zip(jax.tree_util.tree_leaves(bs_stock),
                            jax.tree_util.tree_leaves(bs_fused)):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           rtol=2e-5, atol=2e-5)
        monkeypatch.delenv("PALLAS_CONV_INTERPRET", raising=False)


def test_fused_chw_res_core_grads_match(monkeypatch, np_rng):
    """Gradients through the fused CHW res core (custom-VJP convs + CHW
    BatchNorm) must match the stock NHWC path."""
    from cooperative_training_and_latent_space_data_augmentation_tpu.models import (
        blocks,
    )

    x = jnp.asarray(np_rng.randn(2, 12, 12, 8).astype(np.float32))
    module = blocks._ResCore(features=16)
    variables = module.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params, use_fused):
        if use_fused:
            monkeypatch.setenv("PALLAS_CONV_INTERPRET", "1")
        else:
            monkeypatch.delenv("PALLAS_CONV_INTERPRET", raising=False)
        out, _ = module.apply({"params": params,
                               "batch_stats": variables["batch_stats"]},
                              x, train=True, mutable=["batch_stats"])
        return jnp.sum(out * out)

    g_stock = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_fused = jax.grad(lambda p: loss(p, True))(variables["params"])
    monkeypatch.delenv("PALLAS_CONV_INTERPRET", raising=False)
    for a, b in zip(jax.tree_util.tree_leaves(g_stock),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4)


# ----------------------- multi-chip partitioning (pjit + shardy) -----------------------
#
# pallas_call does not auto-partition; ops/pallas_conv.py teaches pjit the
# batch-DP rule via custom_partitioning (fwd/dx shard-local, dw psum).  These
# run the REAL partitioned path on the 8-virtual-device CPU mesh with the
# kernels in interpret mode.


def _data_mesh():
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()).reshape(len(jax.devices())), ("data",))


def test_sharded_conv_matches_single_device(np_rng):
    """Batch-sharded conv fwd+bwd over 8 devices == unsharded run; the
    sharding propagates through (no all-gather of activations)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (
        pallas_conv as pc,
    )

    H = W = 12
    x = jnp.asarray(np_rng.randn(16, 8, H * W).astype(np.float32))
    w = jnp.asarray(0.2 * np_rng.randn(3, 3, 8, 12).astype(np.float32))

    def loss(x, w):
        y = pc.conv3x3_chw_ad(x, w, H, W, True)
        return jnp.sum(y * y)

    g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    mesh = _data_mesh()
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    v_sharded, (gx_s, gw_s) = g(xs, ws)
    v_single, (gx_1, gw_1) = g(x, w)

    np.testing.assert_allclose(float(v_sharded), float(v_single), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_1),
                               rtol=1e-5, atol=1e-5)
    # dw crosses a psum -> float reorder tolerance
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_1),
                               rtol=1e-4, atol=1e-3)
    # batch sharding must survive the custom call (dim-0 'data' on dx)
    assert gx_s.sharding.spec[0] == "data"
    hlo = g.lower(xs, ws).compile().as_text()
    assert "all-gather" not in hlo


def test_sharded_fused_block_matches_single(monkeypatch, np_rng):
    """The CHW-resident fused _ResCore under pjit over the 8-device mesh
    (custom-partitioned Pallas convs + pjit-partitioned CHW BatchNorm)
    matches the single-device fused path."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cooperative_training_and_latent_space_data_augmentation_tpu.models import (
        blocks,
    )

    monkeypatch.setenv("PALLAS_CONV_INTERPRET", "1")
    x = jnp.asarray(np_rng.randn(16, 12, 12, 8).astype(np.float32))
    module = blocks._ResCore(features=16)
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    assert blocks._fused_chw_ok(x, 16)

    def loss(params, x):
        out, _ = module.apply({"params": params,
                               "batch_stats": variables["batch_stats"]},
                              x, train=True, mutable=["batch_stats"])
        return jnp.mean(out * out)

    g = jax.jit(jax.value_and_grad(loss))
    mesh = _data_mesh()
    ps = jax.device_put(variables["params"], NamedSharding(mesh, P()))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    v_sharded, grads_s = g(ps, xs)
    v_single, grads_1 = g(variables["params"], x)

    np.testing.assert_allclose(float(v_sharded), float(v_single),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads_1),
                    jax.tree_util.tree_leaves(grads_s)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


# ----------------------- stride-2 phase kernel + CHW stage chaining -----------------------


def _stock_s2(x, w):
    return lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_phase_split_round_trip(np_rng):
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (
        pallas_conv as pc,
    )

    x = jnp.asarray(np_rng.randn(3, 16, 12, 5).astype(np.float32))
    xc = pc.nhwc_to_chw(x)
    back = pc.chw_phase_merge(pc.chw_phase_split(xc, 16, 12), 8, 6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(xc))


def test_stride2_phase_conv_matches_stock(np_rng):
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (
        pallas_conv as pc,
    )

    H, W, cin, cout = 16, 12, 5, 7
    x = jnp.asarray(np_rng.randn(3, H, W, cin).astype(np.float32))
    w = jnp.asarray(0.2 * np_rng.randn(3, 3, cin, cout).astype(np.float32))
    xp = pc.chw_phase_split(pc.nhwc_to_chw(x), H, W)
    got = pc.conv3x3s2_phase(xp, w, H=H, W=W, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(pc.nhwc_to_chw(_stock_s2(x, w))),
                               rtol=1e-5, atol=1e-5)


def test_stride2_custom_vjp_matches_stock_grads(np_rng):
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (
        pallas_conv as pc,
    )

    H, W, cin, cout = 12, 16, 4, 6
    x = jnp.asarray(np_rng.randn(2, H, W, cin).astype(np.float32))
    w = jnp.asarray(0.2 * np_rng.randn(3, 3, cin, cout).astype(np.float32))

    def loss_pallas(x, w):
        xp = pc.chw_phase_split(pc.nhwc_to_chw(x), H, W)
        return jnp.sum(jnp.sin(pc.conv3x3s2_phase_ad(xp, w, H, W, True)))

    def loss_stock(x, w):
        return jnp.sum(jnp.sin(pc.nhwc_to_chw(_stock_s2(x, w))))

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_s, gw_s = jax.grad(loss_stock, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s),
                               rtol=1e-5, atol=1e-5)


def test_stride2_sharded_matches_single_device(np_rng):
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops import (
        pallas_conv as pc,
    )

    H, W, cin, cout = 8, 8, 4, 6
    x = jnp.asarray(np_rng.randn(16, H, W, cin).astype(np.float32))
    w = jnp.asarray(0.2 * np_rng.randn(3, 3, cin, cout).astype(np.float32))

    def loss(x, w):
        xp = pc.chw_phase_split(pc.nhwc_to_chw(x), H, W)
        return jnp.sum(jnp.sin(pc.conv3x3s2_phase_ad(xp, w, H, W, True)))

    g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    mesh = _data_mesh()
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    v_s, (gx_s, gw_s) = g(xs, ws)
    v_1, (gx_1, gw_1) = g(x, w)
    np.testing.assert_allclose(float(v_s), float(v_1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_1),
                               rtol=1e-4, atol=1e-3)
    assert "all-gather" not in g.lower(xs, ws).compile().as_text()


def _grads_close(g_ref, g_got, rtol=5e-4):
    """Grad-tree comparison with a zero-grad-aware atol: conv biases feeding
    train-mode BatchNorm have an EXACT zero gradient (the batch-mean
    subtraction cancels any bias shift), so those leaves are pure float
    noise on both sides — atol is scaled to the tree's global grad
    magnitude instead of per-leaf."""
    leaves_ref = jax.tree_util.tree_leaves(g_ref)
    gscale = max(float(jnp.max(jnp.abs(l))) for l in leaves_ref)
    atol = 2e-4 * max(gscale, 1.0)
    for a, b in zip(leaves_ref, jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("case", ["encoder", "decoder_nn", "decoder_bilinear",
                                  "decoder_conv2"])
def test_chw_stage_chaining_matches_stock(monkeypatch, np_rng, case):
    """Full Encoder/Decoder with CHW stage chaining + stride-2 phase kernel
    (PALLAS_CONV_INTERPRET + PALLAS_CONV_S2) vs the stock NHWC path: same
    param tree, same outputs, same emitted batch stats, same grads."""
    from cooperative_training_and_latent_space_data_augmentation_tpu.models.encoder_decoder import (
        Decoder,
        Encoder,
    )

    if case == "encoder":
        # 32x32 bottoms out at a 2x2 latent; 16x16 would reach 1x1, where
        # BatchNorm variance over 2 values amplifies float reorder noise
        # past any useful tolerance.
        module = Encoder(feature_reduce=4)
        inp = jnp.asarray(np_rng.rand(2, 32, 32, 1).astype(np.float32))
    else:
        up = {"decoder_nn": "NN", "decoder_bilinear": "bilinear",
              "decoder_conv2": "Conv2"}[case]
        module = Decoder(output_channel=4, up_type=up)
        inp = jnp.asarray(np_rng.rand(2, 2, 2, 128).astype(np.float32))

    def run(fused):
        if fused:
            monkeypatch.setenv("PALLAS_CONV_INTERPRET", "1")
            monkeypatch.setenv("PALLAS_CONV_S2", "1")
        else:
            monkeypatch.delenv("PALLAS_CONV_INTERPRET", raising=False)
            monkeypatch.setenv("PALLAS_CONV_S2", "0")
        variables = module.init(jax.random.PRNGKey(0), inp, train=False)
        out, mut = module.apply(variables, inp, train=True,
                                mutable=["batch_stats"])

        def loss(p):
            o, _ = module.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                inp, train=True, mutable=["batch_stats"])
            return jnp.mean(o * o)

        g = jax.grad(loss)(variables["params"])
        monkeypatch.delenv("PALLAS_CONV_INTERPRET", raising=False)
        monkeypatch.delenv("PALLAS_CONV_S2", raising=False)
        return variables, out, mut["batch_stats"], g

    v_s, out_s, bs_s, g_s = run(False)
    v_f, out_f, bs_f, g_f = run(True)
    # identical parameter trees: checkpoints are layout-oblivious
    assert (jax.tree_util.tree_structure(v_s)
            == jax.tree_util.tree_structure(v_f))
    for a, b in zip(jax.tree_util.tree_leaves(v_s),
                    jax.tree_util.tree_leaves(v_f)):
        assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               rtol=3e-5, atol=3e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs_s),
                    jax.tree_util.tree_leaves(bs_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-5, atol=3e-5)
    _grads_close(g_s, g_f)


# ------------------------- NL-sublanes kernel (large channels) -------------------------
#
# The second tiling (channels on lanes, flattened batch*pixels on sublanes)
# for the 128-channel stages the CHW kernel rejects — enc.d3/d4 residual
# cores, code decoupler, decoder bottoms (channel plan
# medseg/models/ebm/encoder_decoder.py:351-453).


@pytest.mark.parametrize("n,h,cin,cout", [
    (2, 12, 128, 128),   # latent-resolution stage, single chunk
    (4, 24, 64, 128),    # enc.d3.conv1 shape, chunked (4*576 rows)
    (2, 24, 128, 64),    # decoder bottom
    (3, 12, 128, 128),   # odd batch -> chunk divisor path
])
def test_nl_matches_stock_conv(n, h, cin, cout, np_rng):
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv import (
        conv3x3_nl,
    )

    x = jnp.asarray(np_rng.randn(n, h, h, cin).astype(np.float32))
    w = jnp.asarray(0.1 * np_rng.randn(3, 3, cin, cout).astype(np.float32))
    got = conv3x3_nl(x, w, interpret=True)
    want = _stock(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_nl_edge_masking_kills_cross_image_reads(np_rng):
    """Rolls in the flattened (N*H*W) layout cross image boundaries; the
    per-image edge masks must kill every such contribution.  An input where
    image k is constant k+1 convolved with an all-ones kernel must produce
    per-image outputs identical to running each image alone."""
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv import (
        conv3x3_nl,
    )

    h, c = 12, 64
    x = jnp.stack([jnp.full((h, h, c), float(k + 1)) for k in range(3)])
    w = jnp.ones((3, 3, c, 128), jnp.float32)
    got = conv3x3_nl(x, w, interpret=True)
    for k in range(3):
        alone = conv3x3_nl(x[k:k + 1], w, interpret=True)
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(alone[0]),
                                   rtol=1e-6)


def test_nl_grad_matches_stock(np_rng):
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv import (
        conv3x3_nl_ad,
    )

    n, h, cin, cout = 2, 12, 64, 128
    x = jnp.asarray(np_rng.randn(n, h, h, cin).astype(np.float32))
    w = jnp.asarray(0.1 * np_rng.randn(3, 3, cin, cout).astype(np.float32))
    cot = jnp.asarray(np_rng.randn(n, h, h, cout).astype(np.float32))

    def f_pallas(x, w):
        return jnp.sum(conv3x3_nl_ad(x, w, True) * cot)

    def f_stock(x, w):
        return jnp.sum(_stock(x, w) * cot)

    gx_p, gw_p = jax.grad(f_pallas, argnums=(0, 1))(x, w)
    gx_s, gw_s = jax.grad(f_stock, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_s),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_s),
                               rtol=1e-4, atol=1e-4)


def test_nl_eligibility_rule():
    from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv import (
        _eligible_channels,
        _eligible_channels_nl,
    )

    # the two kernels partition the stages: CHW takes <=64, NL takes the
    # large-channel stages (64<->128 boundaries included on the NL side)
    assert _eligible_channels(16, 16) and not _eligible_channels_nl(16, 16)
    assert _eligible_channels(32, 64) and not _eligible_channels_nl(32, 64)
    assert not _eligible_channels(64, 128) and _eligible_channels_nl(64, 128)
    assert not _eligible_channels(128, 128) and _eligible_channels_nl(128, 128)
    # no overlap anywhere in the network's channel plan
    for cin, cout in [(16, 16), (16, 32), (32, 32), (32, 64), (64, 64),
                      (64, 128), (128, 128), (128, 64)]:
        assert not (_eligible_channels(cin, cout)
                    and _eligible_channels_nl(cin, cout))


def test_nl_sharded_matches_single(np_rng):
    """NL kernel under pjit over the 8-device mesh: batch stays sharded
    (custom_partitioning), values match the single-device run."""
    from jax.sharding import NamedSharding, PartitionSpec

    from cooperative_training_and_latent_space_data_augmentation_tpu.ops.pallas_conv import (
        conv3x3_nl_ad,
    )
    from cooperative_training_and_latent_space_data_augmentation_tpu.parallel.mesh import (
        make_mesh,
    )

    n, h, cin, cout = 8, 12, 64, 128
    x = jnp.asarray(np_rng.randn(n, h, h, cin).astype(np.float32))
    w = jnp.asarray(0.1 * np_rng.randn(3, 3, cin, cout).astype(np.float32))
    cot = jnp.asarray(np_rng.randn(n, h, h, cout).astype(np.float32))

    def loss(x, w):
        return jnp.sum(conv3x3_nl_ad(x, w, True) * cot)

    gx1, gw1 = jax.grad(loss, argnums=(0, 1))(x, w)

    mesh = make_mesh()
    xs = jax.device_put(x, NamedSharding(mesh, PartitionSpec("data")))
    ws = jax.device_put(w, NamedSharding(mesh, PartitionSpec()))
    gx8, gw8 = jax.jit(jax.grad(loss, argnums=(0, 1)))(xs, ws)
    np.testing.assert_allclose(np.asarray(gx8), np.asarray(gx1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw8), np.asarray(gw1),
                               rtol=1e-4, atol=1e-4)

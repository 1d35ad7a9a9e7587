"""int8 serving conv-chain kernel (ops/pallas/q8chain) — interpret-mode
parity against the XLA int8 conv oracle.  Integer accumulation is exact,
so mid-chain int8 outputs must match BITWISE (the f32 affine/round is
deterministic on identical int32 accumulators)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pssr2_tpu.ops.pallas import convchain, q8chain


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = q8chain.MODE
    q8chain.MODE = "interpret"
    yield
    q8chain.MODE = old


def _inputs(seed, h, w, cin, cout):
    rng = np.random.default_rng(seed)
    x8 = jnp.asarray(rng.integers(-127, 128, (2, h, cin, w)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
    wmat8 = convchain.kernel_matrix(k8)
    affine = jnp.asarray(
        np.stack([rng.uniform(1e-4, 1e-2, cout), rng.normal(0, 0.5, cout)]), jnp.float32
    )
    return x8, wmat8, affine


@pytest.mark.parametrize("h,w", [(6, 128), (10, 64), (8, 32)])
@pytest.mark.parametrize("last", [False, True])
def test_q8_layer_matches_oracle(h, w, last):
    p = 128 // min(w, 128)
    x8, wmat8, affine = _inputs(h * w + last, h, w, 32, 32)
    xp = q8chain.pack_nhwc(jnp.transpose(x8, (0, 1, 3, 2)), p) if p > 1 else x8
    yk = q8chain.q8_conv_layer(xp, wmat8, affine, last=last, pack=p, out_dtype=jnp.float32)
    if p > 1:
        yk = jnp.transpose(q8chain.unpack_nhwc(yk, p, w), (0, 1, 3, 2))
    yr = q8chain.reference_q8_layer(x8, wmat8, affine, last=last, out_dtype=jnp.float32)
    if last:
        # int32 accumulators are identical; the f32 affine may contract
        # to FMA differently between the kernel and the oracle (~1e-6 rel)
        np.testing.assert_allclose(
            np.asarray(yk, np.float32), np.asarray(yr, np.float32), rtol=1e-5, atol=1e-4
        )
    else:
        np.testing.assert_array_equal(np.asarray(yk), np.asarray(yr))


def test_q8_two_layer_chain_matches_quantize_tensor_semantics():
    """A mid-chain requant must equal quant.py's quantize_tensor applied
    to the dequantized ReLU output (the scheme the affine folds)."""
    from pssr2_tpu.quant import quantize_tensor

    h, w, cin, cout = 6, 128, 32, 32
    x8, wmat8, _ = _inputs(3, h, w, cin, cout)
    rng = np.random.default_rng(4)
    alpha = jnp.asarray(rng.uniform(1e-4, 1e-3, cout), jnp.float32)  # dequant*BN
    beta = jnp.asarray(rng.normal(0, 0.2, cout), jnp.float32)
    sx_next = 0.037  # next layer's activation scale

    affine_folded = jnp.stack([alpha / sx_next, beta / sx_next])
    y8 = q8chain.q8_conv_layer(x8, wmat8, affine_folded, last=False)

    # oracle: dequantized f32 layer output -> ReLU -> quantize_tensor
    zf = q8chain.reference_q8_layer(
        x8, wmat8, jnp.stack([alpha, beta]), last=True, out_dtype=jnp.float32
    )
    want = quantize_tensor(jnp.maximum(zf, 0.0), 1.0 / sx_next)
    np.testing.assert_array_equal(np.asarray(y8), np.asarray(want))


def test_q8_eligibility():
    assert q8chain.eligible(16, 128, 128, 64, 64)
    assert q8chain.eligible(16, 64, 64, 128, 128)  # packed serving stage
    assert not q8chain.eligible(16, 128, 128, 8, 64)  # int8 sublane tile is 32
    assert not q8chain.eligible(16, 128, 100, 64, 64)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(q8chain, "MODE", "off")
        assert not q8chain.eligible(16, 128, 128, 64, 64)
        mp.setattr(q8chain, "MODE", "auto")
        assert not q8chain.eligible(16, 128, 128, 64, 64)  # CPU backend
        mp.setattr(q8chain, "PACK", False)
        mp.setattr(q8chain, "MODE", "interpret")
        assert not q8chain.eligible(16, 64, 64, 128, 128)  # PACK gates packing

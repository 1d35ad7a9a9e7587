"""End-to-end int8 quality gate: train each quantizable family briefly on
synthetic structured data, then measure the PSNR cost of serving the int8
executor instead of the FP forward on the validation split.

Quantization error is platform-independent (integer conv math + affine
dequant), so this runs on CPU; writes int8_quality.json.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _make_images(root, n=12, res=96):
    from pssr2_tpu.data import tiff

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:res, 0:res]
    for i in range(n):
        img = 127 + 100 * np.sin(xx / (2 + i % 5)) * np.cos(yy / (3 + i % 4))
        img += rng.normal(0, 5, (res, res))
        tiff.imwrite(os.path.join(root, f"{i}.tif"), np.clip(img, 0, 255).astype(np.uint8))


def _psnr(pred, ref):
    mse = float(np.mean((pred.astype(np.float64) - ref.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def main():
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.data import ImageDataset
    from pssr2_tpu.models import RDResUNet, ResUNet, ResUNetA
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.quant import quantize_rdresunet, quantize_resunet
    from pssr2_tpu.train import train_paired
    from pssr2_tpu.util import MSELoss

    tmp = tempfile.mkdtemp(prefix="int8q_")
    _make_images(os.path.join(tmp, "imgs"))

    def families():
        yield "ResUNet", ResUNet(hidden=[16, 32], scale=4, depth=1, rngs=nnx.Rngs(0)), quantize_resunet
        yield (
            "ResUNetA",
            ResUNetA(hidden=[16, 32], scale=4, depth=1, dilations=[[1, 2], [1]],
                     pool_sizes=[1, 2], rngs=nnx.Rngs(0)),
            quantize_resunet,
        )
        yield (
            "RDResUNet",
            RDResUNet(hidden=[16, 16], scale=4, depth=1, rdnet_init=16,
                      growth_rates=[4, 4], ds_blocks=[False, True],
                      ese_blocks=[False, True], n_blocks=[1, 1], rngs=nnx.Rngs(0)),
            quantize_rdresunet,
        )

    results = {}
    for name, model, quantize in families():
        dataset = ImageDataset(os.path.join(tmp, "imgs"), hr_res=96, lr_scale=4)
        train_paired(model, dataset, batch_size=2, loss_fn=MSELoss(), optim=AdamW(1e-3), epochs=3)
        model.eval()

        val = list(dataset.val_idx)
        lr_batch = np.stack([np.asarray(dataset[i][1], np.float32) for i in val])
        hr_batch = np.stack([np.asarray(dataset[i][0], np.float32) for i in val])

        q = quantize(model, [lr_batch])
        fp_out = np.clip(np.asarray(model(jnp.asarray(lr_batch)), np.float32), 0, 255)
        q_out = np.clip(np.asarray(q(jnp.asarray(lr_batch)), np.float32), 0, 255)

        psnr_fp = _psnr(fp_out, hr_batch)
        psnr_q = _psnr(q_out, hr_batch)
        results[name] = {
            "psnr_fp": round(psnr_fp, 3),
            "psnr_int8": round(psnr_q, 3),
            "delta_db": round(psnr_fp - psnr_q, 4),
            "int8_vs_fp_psnr": round(_psnr(q_out, fp_out), 2),
        }
        print(name, json.dumps(results[name]), flush=True)

    with open(os.path.join(HERE, "int8_quality.json"), "w") as f:
        json.dump(results, f, indent=1)

    # The gate: a quantization quality regression must FAIL the run, not
    # just land silently in the artifact (advisor r3).  delta_db is
    # fp PSNR minus int8 PSNR, so positive = int8 worse.
    bad = {k: v for k, v in results.items() if v["delta_db"] > 0.01}
    assert not bad, f"int8 PSNR cost exceeds 0.01 dB: {bad}"


if __name__ == "__main__":
    main()

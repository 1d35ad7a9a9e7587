"""Serving example: export a trained model once, then serve the compiled
artifact with no framework dependency (docs/guide/serving.md).

    python examples/serve.py model.npz artifact.shlo   # export
    python examples/serve.py artifact.shlo lr_dir/     # serve a directory
"""

import os
import sys

import numpy as np


def export(weights_path, out_path, lr_res=128):
    import jax.numpy as jnp

    from pssr2_tpu.checkpoint import load_weights
    from pssr2_tpu.export import export_model
    from pssr2_tpu.models import ResUNet

    model = ResUNet(dtype=jnp.bfloat16)
    load_weights(model, weights_path)
    model.eval()
    export_model(model, out_path, lr_res=lr_res)
    print(f"exported {out_path}")


def serve(artifact_path, lr_dir):
    # serving side: only jax + the artifact (plus any image IO you choose)
    from pssr2_tpu.data import tiff  # stand-in for the serving stack's IO
    from pssr2_tpu.export import load_exported

    fn = load_exported(artifact_path)
    names = sorted(n for n in os.listdir(lr_dir) if n.endswith(".tif"))
    batch = np.stack([tiff.imread(os.path.join(lr_dir, n)) for n in names])
    batch = batch.reshape(len(names), 1, *batch.shape[-2:]).astype(np.float32)
    sr = np.asarray(fn(batch))
    os.makedirs("served", exist_ok=True)
    for name, img in zip(names, sr):
        tiff.imwrite(os.path.join("served", name), np.clip(img[0], 0, 255).astype(np.uint8))
    print(f"served {len(names)} tiles -> served/")


if __name__ == "__main__":
    if sys.argv[1].endswith(".shlo"):
        serve(sys.argv[1], sys.argv[2])
    else:
        export(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 128)

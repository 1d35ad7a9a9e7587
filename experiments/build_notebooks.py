"""Build + execute the three user-facing notebooks with stored outputs.

Mirrors the reference's notebooks/ (train / predict / approximate —
/root/reference/notebooks/*.ipynb) as *executed* walkthroughs: each
notebook is fully self-contained on tiny synthetic microscopy phantoms so
it runs anywhere in ~a minute, while the markdown documents the
real-scale defaults.  The executed outputs (progress logs, metric tables,
matplotlib figures) are stored in the committed .ipynb files;
tests/test_notebooks.py re-executes them in CI.

Run: python experiments/build_notebooks.py        (writes + executes)
     python experiments/build_notebooks.py --write-only
"""

import os
import sys

import nbformat
from nbformat.v4 import new_code_cell, new_markdown_cell, new_notebook

HERE = os.path.dirname(os.path.abspath(__file__))
NB_DIR = os.path.join(os.path.dirname(HERE), "notebooks")

SETUP = """\
# Demo setup: make the repo importable when running from notebooks/ (skip
# if pssr2_tpu is installed), run on CPU so this notebook executes
# anywhere (remove the jax line to use your TPU), work in a temp dir.
import os, sys, tempfile
repo = os.path.abspath("..")
if os.path.isdir(os.path.join(repo, "pssr2_tpu")) and repo not in sys.path:
    sys.path.insert(0, repo)
import jax; jax.config.update("jax_platforms", "cpu")
work = os.path.join(tempfile.gettempdir(), "pssr2_nb")
os.makedirs(work, exist_ok=True)
os.chdir(work)
print("working in", work, "| devices:", jax.devices())"""

PHANTOMS = '''\
# Tiny synthetic "microscopy" dataset: bright puncta + thin filaments on a
# dark background (stand-in for your real high-resolution images).
import numpy as np
from pssr2_tpu.data import tiff

def make_phantoms(out_dir, n, res=256, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32)
    for i in range(n):
        img = np.zeros((res, res), np.float32)
        for _ in range(rng.integers(10, 20)):
            cx, cy = rng.uniform(0, res, 2)
            s = rng.uniform(1.0, 3.0)
            img += rng.uniform(80, 220) * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
        for _ in range(rng.integers(6, 12)):
            x0, y0 = rng.uniform(0, res, 2)
            ang = rng.uniform(0, np.pi)
            t = np.arange(0, rng.uniform(60, 200))
            xs = np.clip(x0 + t * np.cos(ang), 0, res - 1).astype(int)
            ys = np.clip(y0 + t * np.sin(ang), 0, res - 1).astype(int)
            img[ys, xs] += rng.uniform(100, 200)
        tiff.imwrite(os.path.join(out_dir, f"{i:03d}.tif"), np.clip(img, 0, 255).astype(np.uint8))

make_phantoms("hr_images", n=24)
print(len(os.listdir("hr_images")), "HR images in ./hr_images")'''

TRAIN_MODEL = '''\
import jax.numpy as jnp
from pssr2_tpu.crappifiers import Poisson
from pssr2_tpu.data import ImageDataset
from pssr2_tpu.models import ResUNet
from pssr2_tpu.optim import AdamW
from pssr2_tpu.train import train_paired
from pssr2_tpu.util import SSIMLoss

# Semi-synthetic training: HR images are degraded on device by the
# crappifier each step.  At real scale use the defaults —
# ResUNet(dtype=jnp.bfloat16), hr_res=512, batch_size=16.
dataset = ImageDataset("hr_images", hr_res=256, lr_scale=4, crappifier=Poisson(), val_split=0.1)
model = ResUNet(hidden=[16, 32], depth=1)  # demo-sized; default is [64, 128, 256, 512, 1024]

train_losses, val_losses = train_paired(
    model,
    dataset,
    batch_size=4,
    loss_fn=SSIMLoss(mix=0.8, ms=True),
    optim=AdamW(1e-3),
    epochs=3,
    log_frequency=10,
)'''

TRAIN_SAVE = '''\
from pssr2_tpu.checkpoint import save_weights

save_weights(model, f"ResUNet_demo.npz")
print("saved ResUNet_demo.npz | final val loss:", round(val_losses[-1], 4))'''

TRAIN_PLOT = '''\
import matplotlib.pyplot as plt

fig, axes = plt.subplots(1, 2, figsize=(9, 3))
axes[0].plot(train_losses); axes[0].set_title("train loss (per logged step)")
axes[1].plot(val_losses, marker="o"); axes[1].set_title("val loss (per epoch)")
plt.tight_layout(); plt.show()'''

TRAIN_SCALE_MD = """\
## Scaling up

Everything above scales to real data and hardware by swapping the demo sizes
for the defaults:

```python
model = ResUNet(dtype=jnp.bfloat16)                 # canonical x4 model, bf16 on TPU
dataset = ImageDataset("your_hr_images")            # hr_res=512, lr_scale=4
train_paired(model, dataset, batch_size=16, loss_fn=SSIMLoss(mix=0.8, ms=True),
             optim=AdamW(1e-3), epochs=20, steps_per_dispatch=8)
```

- **Multi-chip data parallel**: pass `mesh=pssr2_tpu.parallel.data_mesh()`
  (pjit) or `dp_shard_map=True` (shard_map; keeps the fused Pallas kernels
  eligible per shard, with sync-BN).
- **Resume / fault tolerance**: pass `state_dir=...` — full train state is
  checkpointed every epoch and on SIGTERM, and training resumes from it.
- **CLI equivalent**: `python -m pssr2_tpu -t -dp hr_images -e 20 -b 16`.

The same loop trains every model family: `ResUNetA` (atrous), `RDResUNet` /
`RDResUNetA` (RDNet encoder), and `SwinIR`."""

PREDICT_GUARD = '''\
# This notebook reuses train.ipynb's demo artifacts; rebuild them if absent
# (fast) so the notebook is self-contained.
if not os.path.exists("ResUNet_demo.npz"):
    raise FileNotFoundError("run notebooks/train.ipynb first (same demo directory)")
print("found ResUNet_demo.npz")'''

PREDICT_IMAGES = '''\
from pssr2_tpu.checkpoint import load_weights
from pssr2_tpu.crappifiers import Poisson
from pssr2_tpu.data import ImageDataset
from pssr2_tpu.models import ResUNet
from pssr2_tpu.predict import predict_images

model = ResUNet(hidden=[16, 32], depth=1)
load_weights(model, "ResUNet_demo.npz")
model.eval()

# Predict the dataset's validation split; out_dir=None returns arrays,
# a path saves .tifs with the reference's naming.
dataset = ImageDataset("hr_images", hr_res=256, lr_scale=4, crappifier=Poisson(), val_split=0.1)
preds = predict_images(model, dataset, out_dir=None, batch_size=4)
print(len(preds), "predictions:", sorted(preds)[:2], "...")'''

PREDICT_SHOW = '''\
import matplotlib.pyplot as plt
import numpy as np

idx = dataset.val_idx[0]
hr, lr = dataset[idx]
pred = next(iter(preds.values()))
fig, axes = plt.subplots(1, 3, figsize=(10, 3.4))
for ax, (img, title) in zip(
    axes, [(lr, "LR input (64px)"), (pred, "prediction (256px)"), (hr, "ground truth")]
):
    ax.imshow(np.asarray(img).squeeze(), cmap="magma"); ax.set_title(title); ax.axis("off")
plt.tight_layout(); plt.show()'''

PREDICT_METRICS = '''\
from pssr2_tpu.predict import test_metrics

# On a paired dataset (real LR + real HR), benchmark restoration quality.
# Here the "real" LR images are pre-crappified copies of the phantoms.
from pssr2_tpu.data import PairedImageDataset, tiff

os.makedirs("lr_images", exist_ok=True)
rng = np.random.default_rng(7)
for name in sorted(os.listdir("hr_images")):
    hr_img = tiff.imread(os.path.join("hr_images", name)).squeeze().astype(np.float32)
    lr_img = hr_img.reshape(64, 4, 64, 4).mean(axis=(1, 3))
    lr_img = Poisson().crappify(lr_img)
    tiff.imwrite(os.path.join("lr_images", name), np.clip(lr_img, 0, 255).astype(np.uint8))

paired = PairedImageDataset("hr_images", "lr_images", hr_res=256, lr_scale=4, val_split=0.1)
metrics = test_metrics(model, paired)
{k: round(float(v), 4) for k, v in metrics.items()}'''

PREDICT_SHEETS = '''\
from pssr2_tpu.data import SlidingDataset
from pssr2_tpu.predict import predict_sheets

# Whole-sheet workflow: tile a large LR sheet (lr_scale=-1 = LR mode,
# hr_res = LR tile size), predict each tile, overlap-average the upscaled
# sheet back together on device.
os.makedirs("lr_sheets", exist_ok=True)
sheet = np.concatenate(
    [tiff.imread(os.path.join("lr_images", f"{i:03d}.tif")).squeeze() for i in range(3)], axis=1
)
tiff.imwrite("lr_sheets/sheet.tif", sheet)

sliding = SlidingDataset("lr_sheets", hr_res=64, lr_scale=-1, overlap=16, val_split=1)
sheets = predict_sheets(model, sliding, batch_size=4, margin=8, out_dir=None)
print("reassembled", sheets[0].squeeze().shape, "from", len(sliding), "tiles of", sheet.shape)

fig, axes = plt.subplots(2, 1, figsize=(9, 6))
axes[0].imshow(sheet, cmap="magma"); axes[0].set_title("LR sheet (64px tiles)"); axes[0].axis("off")
axes[1].imshow(sheets[0].squeeze(), cmap="magma"); axes[1].set_title("predicted sheet (4x)"); axes[1].axis("off")
plt.tight_layout(); plt.show()'''

APPROX_DATA = '''\
# Paired real data whose degradation we want to mimic: here we SIMULATE it
# with a known ground-truth crappifier (Poisson(intensity=0.85, gain=3)),
# so the fit below has a known answer to recover.
import numpy as np
from pssr2_tpu.crappifiers import Poisson
from pssr2_tpu.data import PairedImageDataset, tiff

TRUE = dict(intensity=0.85, gain=3.0)
os.makedirs("lr_real", exist_ok=True)
rng = np.random.default_rng(3)
for name in sorted(os.listdir("hr_images")):
    hr_img = tiff.imread(os.path.join("hr_images", name)).squeeze().astype(np.float32)
    lr_img = hr_img.reshape(64, 4, 64, 4).mean(axis=(1, 3))
    lr_img = Poisson(**TRUE).crappify(lr_img)
    tiff.imwrite(os.path.join("lr_real", name), np.clip(lr_img, 0, 255).astype(np.uint8))

paired = PairedImageDataset("hr_images", "lr_real", hr_res=256, lr_scale=4)
print(len(paired), "paired images")'''

APPROX_FIT = '''\
from pssr2_tpu.bayes import Real
from pssr2_tpu.train import approximate_crappifier

space = [Real(0.3, 1.5, name="intensity"), Real(-5, 10, name="gain")]
result = approximate_crappifier(
    Poisson, space, paired, max_images=6, opt_kwargs=dict(n_calls=24, n_initial_points=10, random_state=0)
)
print("fitted:", [round(float(v), 3) for v in result.x], " true:", list(TRUE.values()))
print("objective (image dissimilarity):", round(float(result.fun), 4))'''

APPROX_USE_MD = """\
## Using the fit

Train with the approximated degradation so the model sees realistic
low-resolution inputs:

```python
crappifier = Poisson(*result.x)
dataset = ImageDataset("your_hr_images", crappifier=crappifier)
```

Notes for real data:

- `max_images` trades fit time for objective stability; the objective
  compares noise statistics of crappified HR vs real LR.
- `opt_kwargs=dict(n_calls=...)` controls the Bayesian-optimization budget
  (`n_calls=100` default; 24 here for the demo).
- Any `Crappifier` subclass with numeric constructor parameters works —
  `AdditiveGaussian`, `SaltPepper`, or your own (see
  `pssr2_tpu.crappifiers.Crappifier`)."""


def build_train():
    nb = new_notebook()
    nb.cells = [
        new_markdown_cell(
            "# Train a PSSR2-TPU model\n\n"
            "Counterpart of the reference `notebooks/train.ipynb`: train a ResUNet to "
            "super-resolve microscopy images using semi-synthetic pairs (HR images + a "
            "crappifier).  This demo builds a tiny synthetic dataset and a demo-sized "
            "model so it executes anywhere; the last section shows the real-scale calls."
        ),
        new_code_cell(SETUP),
        new_code_cell(PHANTOMS),
        new_markdown_cell(
            "## Dataset, model, training\n\n"
            "`ImageDataset` crops/downsamples HR images and applies the `crappifier` "
            "on device each step (`Poisson` is the PSSR default).  `train_paired` "
            "runs the canonical MS-SSIM + L1 objective with a seeded, resumable loop."
        ),
        new_code_cell(TRAIN_MODEL),
        new_code_cell(TRAIN_SAVE),
        new_code_cell(TRAIN_PLOT),
        new_markdown_cell(TRAIN_SCALE_MD),
    ]
    return nb


def build_predict():
    nb = new_notebook()
    nb.cells = [
        new_markdown_cell(
            "# Predict, benchmark, and reassemble sheets\n\n"
            "Counterpart of the reference `notebooks/predict.ipynb`: load trained "
            "weights, super-resolve images, compute restoration metrics against "
            "ground truth, and run the tiled whole-sheet workflow.  Run "
            "`train.ipynb` first (same demo directory)."
        ),
        new_code_cell(SETUP),
        new_code_cell(PREDICT_GUARD),
        new_code_cell(PREDICT_IMAGES),
        new_code_cell(PREDICT_SHOW),
        new_markdown_cell(
            "## Restoration metrics\n\n"
            "`test_metrics` evaluates MSE / pixel error / PSNR / SSIM on a paired "
            "dataset, normalizing predictions to ground-truth intensities "
            "(`norm=True`, the reference protocol)."
        ),
        new_code_cell(PREDICT_METRICS),
        new_markdown_cell(
            "## Whole sheets\n\n"
            "`SlidingDataset(lr_scale=-1)` tiles large LR sheets; `predict_sheets` "
            "predicts all tiles batched and overlap-averages the upscaled sheet on "
            "device in one call (equivalently: `predict_images(out_dir=None)` + "
            "`reassemble_sheets`)."
        ),
        new_code_cell(PREDICT_SHEETS),
    ]
    return nb


def build_approximate():
    nb = new_notebook()
    nb.cells = [
        new_markdown_cell(
            "# Approximate crappifier parameters\n\n"
            "Counterpart of the reference `notebooks/approximate.ipynb`: when you "
            "have real paired LR/HR images, fit the degradation model's parameters "
            "by Bayesian optimization (`approximate_crappifier`), then train with "
            "the fitted crappifier."
        ),
        new_code_cell(SETUP),
        new_code_cell(PHANTOMS),
        new_code_cell(APPROX_DATA),
        new_markdown_cell(
            "## Fit\n\n"
            "The objective is non-differentiable (it compares noise statistics of "
            "crappified HR against the real LR), so a Gaussian-process minimizer "
            "searches the parameter space."
        ),
        new_code_cell(APPROX_FIT),
        new_markdown_cell(APPROX_USE_MD),
    ]
    return nb


def main():
    builders = {
        "train.ipynb": build_train,
        "predict.ipynb": build_predict,
        "approximate.ipynb": build_approximate,
    }
    write_only = "--write-only" in sys.argv
    os.makedirs(NB_DIR, exist_ok=True)
    for name, build in builders.items():
        nb = build()
        path = os.path.join(NB_DIR, name)
        if not write_only:
            from nbclient import NotebookClient

            client = NotebookClient(
                nb, timeout=1200, kernel_name="python3", resources={"metadata": {"path": NB_DIR}}
            )
            client.execute()
        nbformat.write(nb, path)
        n_out = sum(len(c.get("outputs", [])) for c in nb.cells)
        print(f"{name}: {len(nb.cells)} cells, {n_out} outputs")


if __name__ == "__main__":
    main()

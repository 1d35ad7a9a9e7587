"""Generate docs/api/*.md from the package docstrings.

Usage: JAX_PLATFORMS=cpu python docs/gen_api.py
Static output is committed so the docs render without tooling (the
reference ships Sphinx rst; here the API reference is plain markdown).
"""

import importlib
import inspect
import re
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "api")

MODULES = [
    ("pssr2_tpu.crappifiers", "Crappifiers"),
    ("pssr2_tpu.data.datasets", "Datasets"),
    ("pssr2_tpu.data.pipeline", "Data pipeline"),
    ("pssr2_tpu.data.io", "Data helpers"),
    ("pssr2_tpu.data.tiff", "TIFF codec"),
    ("pssr2_tpu.data.czi", "CZI codec"),
    ("pssr2_tpu.models", "Models"),
    ("pssr2_tpu.train", "Training"),
    ("pssr2_tpu.predict", "Prediction"),
    ("pssr2_tpu.util", "Utilities"),
    ("pssr2_tpu.optim", "Optimizers & schedulers"),
    ("pssr2_tpu.checkpoint", "Checkpointing"),
    ("pssr2_tpu.torch_import", "Reference .pth interop"),
    ("pssr2_tpu.export", "Serving export (StableHLO)"),
    ("pssr2_tpu.quant", "int8 quantization (serving)"),
    ("pssr2_tpu.bayes", "Bayesian optimization"),
    ("pssr2_tpu.profiler", "Profiling"),
    ("pssr2_tpu.ops.ssim", "SSIM ops"),
    ("pssr2_tpu.ops.metrics", "Metric ops"),
    ("pssr2_tpu.ops.degrade", "Device degradation ops"),
    ("pssr2_tpu.ops.stitch", "Stitching ops"),
    ("pssr2_tpu.ops.smallconv", "Fused upsample tail"),
    ("pssr2_tpu.ops.batchnorm", "Fast BatchNorm"),
    ("pssr2_tpu.ops.pallas.chanstats", "Pallas channel stats"),
    ("pssr2_tpu.ops.pallas.gradhist", "Pallas GradHist"),
    ("pssr2_tpu.ops.pallas.ssimfused", "Pallas fused SSIM / mixed loss"),
    ("pssr2_tpu.ops.pallas.winattn", "Pallas window attention"),
    ("pssr2_tpu.ops.pallas.swinblock", "Pallas fused Swin block"),
    ("pssr2_tpu.ops.pallas.rdtail", "Pallas fused RDNet block tail"),
    ("pssr2_tpu.ops.pallas.guard", "Pallas mesh guard"),
    ("pssr2_tpu.parallel.mesh", "Mesh helpers"),
    ("pssr2_tpu.parallel.tp", "Tensor parallelism"),
    ("pssr2_tpu.parallel.spatial", "Spatial (halo) parallelism"),
    ("pssr2_tpu.parallel.distributed", "Multi-host"),
    ("pssr2_tpu.declaration", "CLI declaration parser"),
]


def _sig(obj):
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # sentinel defaults repr as "<object object at 0x...>" — strip the
    # address so regeneration doesn't churn the pages
    return re.sub(r"<object object at 0x[0-9a-f]+>", "<unset>", sig)


def _doc(obj):
    d = inspect.getdoc(obj)
    return d or ""


def _is_local(obj, modname):
    return getattr(obj, "__module__", None) == modname


def render_module(modname, title):
    mod = importlib.import_module(modname)
    lines = [f"# {title} — `{modname}`", ""]
    moddoc = _doc(mod)
    if moddoc:
        lines += [moddoc, ""]

    members = []
    public = getattr(mod, "__all__", None)
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if public is not None and name not in public and _is_local(obj, modname) is False:
            continue
        if not (inspect.isclass(obj) or inspect.isfunction(obj)):
            continue
        if not _is_local(obj, modname) and modname != "pssr2_tpu.models":
            continue
        members.append((name, obj))

    for name, obj in members:
        if inspect.isclass(obj):
            lines += [f"## class `{name}{_sig(obj)}`", ""]
            d = _doc(obj) or _doc(getattr(obj, "__init__", obj))
            if d:
                lines += [d, ""]
            for mname, m in inspect.getmembers(obj, predicate=inspect.isfunction):
                if mname.startswith("_") or m.__qualname__.split(".")[0] != name:
                    continue
                lines += [f"### `{name}.{mname}{_sig(m)}`", ""]
                md = _doc(m)
                if md:
                    lines += [md, ""]
        else:
            lines += [f"## `{name}{_sig(obj)}`", ""]
            d = _doc(obj)
            if d:
                lines += [d, ""]
    return "\n".join(lines) + "\n"


def main():
    os.makedirs(OUT, exist_ok=True)
    index = ["# API reference", ""]
    for modname, title in MODULES:
        fname = modname.replace("pssr2_tpu.", "").replace(".", "_") + ".md"
        try:
            text = render_module(modname, title)
        except Exception as e:  # keep the generator total
            text = f"# {title} — `{modname}`\n\n(generation failed: {e})\n"
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(text)
        index.append(f"- [{title}]({fname}) — `{modname}`")
    with open(os.path.join(OUT, "README.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(MODULES)} API pages to {OUT}")


if __name__ == "__main__":
    main()

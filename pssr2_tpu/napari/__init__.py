"""napari GUI plugin (optional extra; reference: pssr/napari/).

Importing this package requires napari/qtpy/magicgui/superqt.  The plugin
registers Train and Predict dock widgets via napari.yaml; all Qt imports are
deferred so the core framework stays GUI-free.
"""

__all__ = ["TrainWidget", "PredictWidget"]


def __getattr__(name):
    if name in __all__:
        from .widgets import PredictWidget, TrainWidget

        return {"TrainWidget": TrainWidget, "PredictWidget": PredictWidget}[name]
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

"""napari plugin internals (reference: pssr/napari/_util.py): auto-generated
object editors from constructor signatures, and stdout/stderr capture to Qt
signals.

Qt/magicgui are optional extras, so the widget classes are built lazily by
:func:`build_util_classes` on first use; the signature-introspection logic
(:func:`object_spec`) is pure Python and testable headless.
"""

import inspect
from contextlib import redirect_stderr, redirect_stdout
from functools import lru_cache, partial
from pathlib import Path


def object_spec(cls):
    """(arg, default, annotation) triples for a constructor, skipping self
    and keyword-only args (mirrors inspect.getfullargspec use at
    reference _util.py:78-83)."""
    spec = inspect.getfullargspec(cls.__init__ if isinstance(cls, type) else cls)
    args = [a for a in spec.args if a != "self"]
    defaults = [None] * (len(args) - len(spec.defaults or ())) + list(spec.defaults or ())
    return [(arg, default, spec.annotations.get(arg)) for arg, default in zip(args, defaults)]


def advanced_ignore_maps():
    from ..data import ImageDataset, PairedImageDataset, PairedSlidingDataset, SlidingDataset
    from ..models import RDResUNet, ResUNet, SwinIR

    # Parameter-index maps mirroring the reference's ADVANCED/IGNORE split
    # (reference _util.py:14-26), adjusted to this package's signatures.
    advanced = {
        ResUNet: list(range(4, 6 + 1)),
        RDResUNet: list(range(4, 6 + 1)) + list(range(12, 16 + 1)),
        SwinIR: list(range(8, 18 + 1)),
    }
    ignore = {
        SwinIR: [],
        ImageDataset: [3, 11],
        SlidingDataset: [3, 15],
        PairedImageDataset: [9],
        PairedSlidingDataset: [13],
    }
    return advanced, ignore


class _SignalCapture:
    def __init__(self, signal):
        self.signal = signal

    def write(self, text):
        self.signal.emit(text)

    def flush(self):
        pass


@lru_cache(maxsize=1)
def build_util_classes():
    """Build (ObjectEdit, SignalWrapper) — requires qtpy/magicgui/superqt."""
    from magicgui.type_map import get_widget_class
    from magicgui.widgets import CheckBox, ComboBox, Container, FileEdit, LineEdit, ListEdit, create_widget
    from qtpy.QtCore import QObject, Signal
    from qtpy.QtWidgets import QVBoxLayout, QWidget
    from superqt import QCollapsible

    from ..crappifiers import AdditiveGaussian, Blur, Poisson, SaltPepper
    from ..data import ImageDataset, SlidingDataset

    class ObjectEdit(QWidget):
        """Collapsible editor for one object (model/dataset/crappifier)
        producing a constructor-declaration string, parsed by the restricted
        declaration parser — never eval'd.  (reference: _util.py:28-135)
        """

        def __init__(self, title, objects, hide_crappifier=False):
            super().__init__()
            self._objects = {item.__name__: item for item in objects}
            self.collapse = QCollapsible(title)

            self.type = ComboBox(name="Type", choices=list(self._objects))
            self.type.changed.connect(self._clear_arguments)
            self.collapse.addWidget(self.type.native)

            self.arg_container = Container()
            self.collapse.addWidget(self.arg_container.native)

            self._dataset_types = (ImageDataset, SlidingDataset)
            if any(item in objects for item in self._dataset_types):
                self.crappifier = ObjectEdit("Crappifier", [AdditiveGaussian, Poisson, SaltPepper, Blur])
                self.crappifier.type.changed.connect(
                    lambda: self._set_arguments("crappifier", self.crappifier.object, raw=True)
                )
                self.crappifier.arg_container.changed.connect(
                    lambda: self._set_arguments("crappifier", self.crappifier.object, raw=True)
                )
                self.type.changed.connect(self._assert_crappifier)
                self.collapse.addWidget(self.crappifier)
                if hide_crappifier:
                    self.crappifier.collapse.collapse()
            else:
                self.crappifier = None

            self.advanced_container = Container()
            self.advanced_collapse = QCollapsible("Advanced Options")
            self.advanced_collapse.addWidget(self.advanced_container.native)
            self.collapse.addWidget(self.advanced_collapse)

            self.collapse.expand()
            self._clear_arguments()

            layout = QVBoxLayout()
            layout.addWidget(self.collapse)
            self.setLayout(layout)

        @property
        def object(self):
            return f"{self.type.current_choice}({', '.join(f'{k}={v}' for k, v in self.arguments.items())})"

        def _clear_arguments(self):
            self.arguments = {}
            self.arg_container.clear()
            self.advanced_container.clear()

            choice = self._objects[self.type.current_choice]
            advanced, ignore = advanced_ignore_maps()
            advanced_idx = advanced.get(choice, [])
            ignore_idx = ignore.get(choice, [])

            for idx, (arg, default, annotation) in enumerate(object_spec(choice)):
                if idx in ignore_idx or annotation is None:
                    continue

                widget_type = get_widget_class(annotation=annotation)[0]

                if widget_type is not ListEdit:
                    options = {}
                    if widget_type not in [CheckBox, LineEdit, FileEdit]:
                        options = dict(max=2**14, min=-1)
                    if widget_type is FileEdit:
                        options = dict(mode="d")
                    widget = create_widget(value=default, annotation=annotation, name=arg, options=options)
                else:
                    if not isinstance(default, list) and default:
                        default = [default]
                    numeric = any(item in str(annotation) for item in ["int", "float"])
                    widget = ListEdit(
                        value=default if default is not None else [0],
                        name=arg,
                        options=dict(max=2**14, min=-1) if numeric else {},
                    )
                    if default is None:
                        widget._pop_value()

                widget.changed.connect(partial(self._set_arguments, arg))
                self._set_arguments(arg, default)

                if idx in advanced_idx:
                    self.advanced_container.append(widget)
                else:
                    self.arg_container.append(widget)

            if self.crappifier is not None and choice in self._dataset_types:
                self._set_arguments("crappifier", self.crappifier.object, raw=True)

            if advanced_idx:
                self.advanced_collapse.show()
            else:
                self.advanced_collapse.hide()

        def _set_arguments(self, name, value, raw=False):
            if value == []:
                self.arguments[name] = None
            elif isinstance(value, (str, Path)) and not raw:
                self.arguments[name] = f'"{value}"'
            else:
                self.arguments[name] = value

        def _assert_crappifier(self):
            if self._objects[self.type.current_choice] in self._dataset_types:
                self.crappifier.show()
            else:
                self.crappifier.hide()

    class SignalWrapper(QObject):
        """Runs a function with stdout/stderr redirected to Qt signals
        (reference: _util.py:148-182)."""

        out = Signal(str)
        err = Signal(str)

        def __init__(self, func):
            super().__init__()
            self.func = func

        def capture(self):
            with redirect_stdout(_SignalCapture(self.out)):
                with redirect_stderr(_SignalCapture(self.err)):
                    self.func()

    return ObjectEdit, SignalWrapper

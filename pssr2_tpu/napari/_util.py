"""napari plugin Qt shell.

The editor LOGIC (constructor introspection, argument state, declaration
assembly) lives in pssr2_tpu/napari/logic.py and is pure Python; this
module renders :class:`logic.WidgetSpec` rows with magicgui/Qt and forwards
changes back into a :class:`logic.DeclarationModel`.  This split is this
framework's own design — the reference couples state and Qt in one widget
class (reference: pssr/napari/_util.py:28-135).

Qt/magicgui are optional extras, so the widget classes are built lazily by
:func:`build_util_classes` on first use.
"""

from contextlib import redirect_stderr, redirect_stdout
from functools import lru_cache, partial

from .logic import DeclarationModel, advanced_ignore_maps, format_value, object_spec  # noqa: F401 (re-exported)


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
    from magicgui.widgets import CheckBox, ComboBox, Container, FileEdit, LineEdit, ListEdit, PushButton, create_widget
    from qtpy.QtCore import QObject, Signal
    from qtpy.QtWidgets import QVBoxLayout, QWidget
    from superqt import QCollapsible

    from ..crappifiers import AdditiveGaussian, Blur, Poisson, SaltPepper
    from ..data import ImageDataset, SlidingDataset

    class NestedListEdit(Container):
        """Editor for list[list[int]] parameters (e.g. ResUNet-family
        ``dilations``): one ListEdit row per inner list plus add/remove row
        buttons.  Own design replacing the reference's _LargeList
        (reference: _util.py:137-147)."""

        def __init__(self, value, name, options):
            super().__init__(name=name, layout="vertical")
            self._options = options
            self._rows = Container(layout="vertical")
            self.append(self._rows)
            buttons = Container(layout="horizontal", labels=False)
            add = PushButton(text="+ row")
            remove = PushButton(text="- row")
            add.clicked.connect(lambda: self._add_row([0]))
            remove.clicked.connect(self._remove_row)
            buttons.append(add)
            buttons.append(remove)
            self.append(buttons)
            for inner in value or [[0]]:
                self._add_row(list(inner))

        def _add_row(self, inner):
            row = ListEdit(value=inner, options=self._options)
            row.changed.connect(lambda *_: self.changed.emit(self.value))
            self._rows.append(row)
            self.changed.emit(self.value)

        def _remove_row(self):
            if len(self._rows) > 0:
                self._rows.pop()
                self.changed.emit(self.value)

        @property
        def value(self):
            return [list(row.value) for row in self._rows]

    class ObjectEdit(QWidget):
        """Collapsible editor for one object (model/dataset/crappifier):
        renders the DeclarationModel's widget specs; the declaration string
        is parsed by the restricted parser — never eval'd."""

        def __init__(self, title, objects, hide_crappifier=False):
            super().__init__()
            self._dataset_types = (ImageDataset, SlidingDataset)
            child_arg = "crappifier" if any(item in objects for item in self._dataset_types) else None
            self.model = DeclarationModel(objects, child_arg=child_arg)

            self.collapse = QCollapsible(title)
            self.type = ComboBox(name="Type", choices=list(self.model.objects))
            self.type.changed.connect(self._rebuild)
            self.collapse.addWidget(self.type.native)

            self.arg_container = Container()
            self.collapse.addWidget(self.arg_container.native)

            if child_arg:
                self.crappifier = ObjectEdit("Crappifier", [AdditiveGaussian, Poisson, SaltPepper, Blur])
                self.crappifier.type.changed.connect(self._sync_crappifier)
                self.crappifier.arg_container.changed.connect(self._sync_crappifier)
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
            self._rebuild()

            layout = QVBoxLayout()
            layout.addWidget(self.collapse)
            self.setLayout(layout)

        @property
        def object(self):
            return self.model.declaration

        @property
        def arguments(self):
            """Raw current argument values (e.g. ``arguments["hr_res"]`` for
            the viewer's placeholder layer shape)."""
            return self.model.values

        def _on_arg_changed(self, name, widget, *_):
            self.model.set_arg(name, widget.value)

        def _sync_crappifier(self, *_):
            if self.crappifier is not None and self.model.current_class in self._dataset_types:
                self.model.set_child(self.crappifier.object)

        def _make_widget(self, spec):
            if spec.kind == "nested_list":
                return NestedListEdit(spec.default, name=spec.name, options=spec.options)
            if spec.kind == "list":
                default = spec.default
                if default is not None and not isinstance(default, list):
                    default = [default]
                widget = ListEdit(
                    value=default if default is not None else [0],
                    name=spec.name,
                    options=spec.options if spec.numeric else {},
                )
                if spec.default is None:
                    widget._pop_value()
                return widget
            if spec.kind == "path":
                return FileEdit(value=spec.default or "", name=spec.name, mode="d")
            if spec.kind == "bool":
                return CheckBox(value=bool(spec.default), name=spec.name)
            if spec.kind == "str":
                return LineEdit(value=spec.default or "", name=spec.name)
            annotation = int if spec.kind == "int" else float
            return create_widget(
                value=spec.default, annotation=annotation, name=spec.name, options=spec.options
            )

        def _rebuild(self, *_):
            self.arg_container.clear()
            self.advanced_container.clear()
            rows = self.model.select(self.type.current_choice)

            for spec in rows:
                widget = self._make_widget(spec)
                # Read .value from the widget rather than trusting the
                # signal payload: ValueWidgets emit their value but
                # Container-based editors (ListEdit/NestedListEdit) emit
                # the container itself when a child row changes, which
                # would format the widget object into the declaration.
                widget.changed.connect(partial(self._on_arg_changed, spec.name, widget))
                (self.advanced_container if spec.advanced else self.arg_container).append(widget)

            if self.crappifier is not None:
                if self.model.current_class in self._dataset_types:
                    self.crappifier.show()
                    self._sync_crappifier()
                else:
                    self.crappifier.hide()
                    self.model.remove_child()

            if any(spec.advanced for spec in rows):
                self.advanced_collapse.show()
            else:
                self.advanced_collapse.hide()

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

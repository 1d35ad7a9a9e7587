"""Toolkit-independent GUI logic for the napari plugin.

This is this framework's own design for the plugin's core (the reference
couples widget construction, argument state, and Qt signal wiring in one
class — pssr/napari/_util.py:28-135).  Here the editor is split in two:

- this module: a pure-Python model — constructor introspection to
  :class:`WidgetSpec` rows, argument state, and declaration-string
  assembly.  Fully testable headless (no Qt/magicgui import), and the
  produced strings go through the restricted declaration parser
  (pssr2_tpu.declaration) — never ``eval``.
- pssr2_tpu/napari/_util.py: a thin Qt/magicgui shell that renders the
  specs and forwards value changes back into the model.

Includes the nested ``list[list[int]]`` editor spec the ResUNet-family
``dilations`` parameter needs (reference analog: _util.py:137-147).
"""

import inspect
from dataclasses import dataclass, field
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


@dataclass
class WidgetSpec:
    """One editable constructor argument, toolkit-agnostic."""

    name: str
    kind: str  # int | float | bool | str | path | list | nested_list
    default: object
    advanced: bool = False
    numeric: bool = False  # list element type is numeric
    options: dict = field(default_factory=dict)


def _classify(annotation) -> str:
    """Annotation -> widget kind."""
    if annotation is bool:
        return "bool"
    if annotation is int:
        return "int"
    if annotation is float:
        return "float"
    if annotation is str:
        return "str"
    if annotation is Path:
        return "path"
    text = str(annotation)
    if text.startswith("list[list"):
        return "nested_list"
    if text.startswith("list"):
        return "list"
    return "skip"


def widget_specs(cls):
    """The editable argument rows for one constructor, in declaration
    order, honoring the ADVANCED/IGNORE maps."""
    advanced, ignore = advanced_ignore_maps()
    advanced_idx = advanced.get(cls, [])
    ignore_idx = ignore.get(cls, [])

    rows = []
    for idx, (arg, default, annotation) in enumerate(object_spec(cls)):
        if idx in ignore_idx or annotation is None:
            continue
        kind = _classify(annotation)
        if kind == "skip":
            continue
        numeric = kind in ("int", "float") or (
            kind in ("list", "nested_list") and any(t in str(annotation) for t in ("int", "float"))
        )
        options = {"max": 2**14, "min": -1} if numeric else {}
        if kind == "path":
            options = {"mode": "d"}
        rows.append(
            WidgetSpec(
                name=arg,
                kind=kind,
                default=default,
                advanced=idx in advanced_idx,
                numeric=numeric,
                options=options,
            )
        )
    return rows


def format_value(value, raw=False):
    """Render one argument value into declaration syntax (parsed by the
    restricted parser, pssr2_tpu/declaration.py — never eval'd)."""
    if value == [] or value is None:
        return "None"
    if isinstance(value, (str, Path)) and not raw:
        return f'"{value}"'
    return str(value)


class DeclarationModel:
    """Argument state for one object editor (model/dataset/crappifier).

    The GUI shell calls :meth:`select` when the type combo changes (getting
    the widget rows to render) and :meth:`set_arg` on every value change;
    :attr:`declaration` always holds the current constructor string.
    """

    def __init__(self, objects, child_arg: str = None):
        self.objects = {item.__name__: item for item in objects}
        self.child_arg = child_arg  # e.g. "crappifier": value supplied by a sub-editor
        self.current = next(iter(self.objects))
        self.arguments = {}
        self.values = {}  # raw (unformatted) argument values, same keys
        self.select(self.current)

    @property
    def current_class(self):
        return self.objects[self.current]

    def select(self, type_name: str):
        """Switch object type; resets arguments to defaults.  Returns the
        WidgetSpec rows for the shell to render."""
        if type_name not in self.objects:
            raise KeyError(f"unknown type {type_name!r}; choices: {list(self.objects)}")
        self.current = type_name
        rows = widget_specs(self.objects[type_name])
        self.arguments = {row.name: format_value(row.default) for row in rows}
        self.values = {row.name: row.default for row in rows}
        return rows

    def set_arg(self, name: str, value, raw: bool = False):
        self.arguments[name] = format_value(value, raw=raw)
        self.values[name] = value

    def set_child(self, declaration: str):
        """Set the sub-editor-supplied argument (e.g. crappifier=Poisson(...))."""
        if self.child_arg:
            self.arguments[self.child_arg] = declaration
            self.values[self.child_arg] = declaration

    def remove_child(self):
        if self.child_arg:
            self.arguments.pop(self.child_arg, None)
            self.values.pop(self.child_arg, None)

    @property
    def declaration(self) -> str:
        args = ", ".join(f"{k}={v}" for k, v in self.arguments.items())
        return f"{self.current}({args})"

"""Restricted constructor-string parser for the CLI and GUI.

The reference CLI ``eval``s user strings as Python constructors
(reference: pssr/__main__.py:16-24) — e.g. ``-mt "ResUNet(hidden=[128,256])"``.
This parser keeps that exact surface syntax but evaluates via the AST with a
whitelist: only registered constructor names may be called, and all argument
values must be literals or nested registered constructors.  No arbitrary
code execution.
"""

import ast


def _registry():
    from . import crappifiers, models
    from .data import datasets

    names = {}
    for mod in (models, datasets, crappifiers):
        for name in getattr(mod, "__all__", dir(mod)):
            obj = getattr(mod, name, None)
            if isinstance(obj, type) or name in ("ResUNetA", "RDResUNetA"):
                names[name] = obj
    for name in ("ImageDataset", "SlidingDataset", "PairedImageDataset", "PairedSlidingDataset"):
        names[name] = getattr(datasets, name)
    return names


def parse_declaration(expression: str, extra_names: dict = None):
    """Evaluate a constructor expression like ``ResUNet(hidden=[128, 256])``
    against the model/dataset/crappifier registry. Bare names are called with
    no arguments (``"ResUNet"`` == ``"ResUNet()"``)."""
    registry = _registry()
    if extra_names:
        registry.update(extra_names)

    tree = ast.parse(expression.strip(), mode="eval")

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in registry:
                raise ValueError(f"Unknown or disallowed constructor: {ast.dump(node.func)}")
            args = [ev(a) for a in node.args]
            kwargs = {kw.arg: ev(kw.value) for kw in node.keywords}
            return registry[node.func.id](*args, **kwargs)
        if isinstance(node, ast.Name):
            if node.id in registry:
                return registry[node.id]()
            if node.id in ("None", "True", "False"):  # py<3.8 style guards
                return {"None": None, "True": True, "False": False}[node.id]
            raise ValueError(f"Unknown name: {node.id}")
        try:
            return ast.literal_eval(node)
        except (ValueError, SyntaxError) as err:
            raise ValueError(f"Disallowed expression element: {ast.dump(node)}") from err

    return ev(tree)


def handle_declaration(arg: str, defaults, req=None):
    """CLI-surface parity with the reference's ``_handle_declaration``
    (pssr/__main__.py:16-24): bare default names become no-arg constructors;
    ``req`` prepends required positional args (paths)."""
    req_s = ", ".join(req) + ", " if req else ""
    if arg in defaults:
        expression = arg + f"({req_s})"
    else:
        head, _, tail = arg.partition("(")
        expression = head + f"({req_s}" + tail
    return parse_declaration(expression)

"""Generates docs/api_generated.md from package docstrings.

The framework's counterpart of the reference's Sphinx autosummary build
(reference: docs/ Sphinx site, docs/api.md autosummary): walks the public
modules, renders each public function/class signature + docstring to one
markdown file. Run via ``make docs`` or ``python docs/gen_api.py``.
"""

import importlib
import inspect
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

MODULES = [
    ("tensorflow_nufft_tpu", ["nufft", "nufft_type3", "Type3Plan",
                              "nudft_type3", "interp", "spread", "nudft",
                              "Options", "DebuggingOptions", "FftwOptions",
                              "FftwPlanningRigor", "PointsRange"]),
    ("tensorflow_nufft_tpu.planar", None),
    ("tensorflow_nufft_tpu.parallel.sharded", None),
    ("tensorflow_nufft_tpu.models.mri", None),
    ("tensorflow_nufft_tpu.plan.plan", None),
    ("tensorflow_nufft_tpu.options.options", None),
    ("tensorflow_nufft_tpu.native", None),
    ("tensorflow_nufft_tpu.utils.profiling", None),
]


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj):
    doc = inspect.getdoc(obj)
    return doc or "*(no docstring)*"


def _public_members(mod, names):
    if names is not None:
        return [(n, getattr(mod, n)) for n in names if hasattr(mod, n)]
    out = []
    exported = getattr(mod, "__all__", None)
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if exported is not None and name not in exported:
            continue
        if inspect.ismodule(obj):
            continue
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        # Only document symbols defined in (or re-exported by) the package.
        obj_mod = getattr(obj, "__module__", "") or ""
        if not obj_mod.startswith("tensorflow_nufft_tpu"):
            continue
        out.append((name, obj))
    return out


def render():
    lines = ["# API reference (generated)", "",
             "Generated from docstrings by `docs/gen_api.py` "
             "(`make docs`). The curated overview lives in "
             "[api.md](api.md).", ""]
    for mod_name, names in MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except Exception as e:  # keep the build going
            lines += [f"## `{mod_name}`", "", f"*(import failed: {e})*", ""]
            continue
        lines += [f"## `{mod_name}`", ""]
        mod_doc = inspect.getdoc(mod)
        if mod_doc:
            lines += [mod_doc, ""]
        for name, obj in _public_members(mod, names):
            if inspect.isclass(obj):
                lines += [f"### class `{name}{_signature(obj)}`", "",
                          _doc(obj), ""]
                for mname, meth in inspect.getmembers(obj):
                    if mname.startswith("_") or not callable(meth):
                        continue
                    if not getattr(meth, "__doc__", None):
                        continue
                    qual = getattr(meth, "__qualname__", "")
                    if not qual.startswith(obj.__name__ + "."):
                        continue
                    lines += [f"#### `{name}.{mname}{_signature(meth)}`",
                              "", _doc(meth), ""]
            else:
                lines += [f"### `{name}{_signature(obj)}`", "",
                          _doc(obj), ""]
    return "\n".join(lines) + "\n"


def main():
    out = ROOT / "docs" / "api_generated.md"
    out.write_text(render())
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()

"""Reference signature-parity sweep.

AST-extracts parameter names, order and defaults from the reference's
adjustment classes (``train``/``adjust``/``_train``/``_adjust``) and the
public ``processing``/``utils`` functions, then compares them against the
runtime ``inspect.signature`` of the same names in xsdba_tpu.  A renamed
kwarg, dropped parameter, reordered positional, or changed default fails
the sweep; deliberate deviations live in the explicit allowlists below.
"""

import ast
import importlib
import inspect
import pathlib

import pytest

import xsdba_tpu

REF = pathlib.Path("/root/reference/src/xsdba")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference tree not present")

ADJUSTMENT_CLASSES = [
    "EmpiricalQuantileMapping",
    "DetrendedQuantileMapping",
    "QuantileDeltaMapping",
    "ExtremeValues",
    "LOCI",
    "Scaling",
    "PrincipalComponents",
    "NpdfTransform",
    "OTC",
    "dOTC",
    "MBCn",
]

# modules searched (in order) for the runtime counterpart of a public name
SEARCH_MODULES = [
    "xsdba_tpu",
    "xsdba_tpu.processing",
    "xsdba_tpu.utils",
    "xsdba_tpu.utils.helpers",
    "xsdba_tpu.base",
    "xsdba_tpu.nbutils",
    "xsdba_tpu.units",
]

# reference module-level constants that appear as default expressions
_CONST = {"ADDITIVE": "+", "MULTIPLICATIVE": "*"}

# (owner, param) -> reason.  Every entry is a deliberate deviation.
ALLOWED_DEVIATIONS: dict[tuple[str, str], str] = {
    ("processing.escore", "dims"): (
        "reference default ('variables', 'time') predates its own multivar "
        "rename: reference stack_variables produces a 'multivar' dim, so the "
        "reference default errors on its own stacked output and every real "
        "call passes dims explicitly.  Our default matches stack_variables; "
        "explicit reference-style calls behave identically."
    ),
}


def _iter_params(args: ast.arguments):
    """Yield (name, default_ast|None, kind) skipping self/cls."""
    pos = args.posonlyargs + args.args
    defaults = [None] * (len(pos) - len(args.defaults)) + list(args.defaults)
    for a, d in zip(pos, defaults):
        if a.arg in ("self", "cls"):
            continue
        yield a.arg, d, "pos"
    for a, d in zip(args.kwonlyargs, args.kw_defaults):
        yield a.arg, d, "kw"


def _default_repr(node):
    """Comparable form of a reference default: literal value, resolved
    module constant, or the unparsed expression string."""
    if node is None:
        return inspect.Parameter.empty
    try:
        return ast.literal_eval(node)
    except (ValueError, SyntaxError):
        pass
    src = ast.unparse(node)
    return _CONST.get(src, ("<expr>", src))


def _runtime_callable(name):
    for modname in SEARCH_MODULES:
        mod = importlib.import_module(modname)
        fn = getattr(mod, name, None)
        if callable(fn):
            return fn
    return None


def _check_signature(owner: str, ref_args: ast.arguments, fn, problems: list):
    """Compare reference AST params against the runtime signature of fn."""
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        problems.append(f"{owner}: no inspectable signature")
        return
    ours = {
        n: p
        for n, p in sig.parameters.items()
        if n not in ("self", "cls") and p.kind not in (p.VAR_POSITIONAL, p.VAR_KEYWORD)
    }
    has_var_kw = any(p.kind == p.VAR_KEYWORD for p in sig.parameters.values())
    our_order = list(ours)

    prev_idx = -1
    for name, default_node, kind in _iter_params(ref_args):
        if (owner, name) in ALLOWED_DEVIATIONS:
            continue
        if name not in ours:
            if not has_var_kw:
                problems.append(f"{owner}: missing parameter {name!r}")
            continue
        # positional order must be preserved for positional reference params
        if kind == "pos":
            idx = our_order.index(name)
            if idx < prev_idx:
                problems.append(f"{owner}: parameter {name!r} out of order")
            prev_idx = idx
        want = _default_repr(default_node)
        if isinstance(want, tuple) and want and want[0] == "<expr>":
            continue  # non-literal reference default: names-only check
        got = ours[name].default
        if want is inspect.Parameter.empty:
            continue  # required in the reference; ours may relax or match
        if got is inspect.Parameter.empty:
            problems.append(f"{owner}: {name!r} lost its default ({want!r})")
        elif not (got == want or repr(got) == repr(want)):
            problems.append(f"{owner}: {name!r} default {got!r} != reference {want!r}")


def test_adjustment_class_signatures():
    tree = ast.parse((REF / "adjustment.py").read_text())
    problems = []
    seen = set()
    for node in tree.body:
        if not isinstance(node, ast.ClassDef) or node.name not in ADJUSTMENT_CLASSES:
            continue
        seen.add(node.name)
        our_cls = getattr(xsdba_tpu, node.name)
        for item in node.body:
            if not isinstance(item, ast.FunctionDef):
                continue
            if item.name not in ("train", "adjust", "_train", "_adjust"):
                continue
            ours = inspect.getattr_static(our_cls, item.name, None)
            if ours is None:
                problems.append(f"{node.name}.{item.name}: method missing")
                continue
            if isinstance(ours, (classmethod, staticmethod)):
                ours = ours.__func__
            _check_signature(f"{node.name}.{item.name}", item.args, ours, problems)
    assert seen == set(ADJUSTMENT_CLASSES), f"classes not found in reference: {set(ADJUSTMENT_CLASSES) - seen}"
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("modname", ["processing", "utils"])
def test_public_function_signatures(modname):
    tree = ast.parse((REF / f"{modname}.py").read_text())
    problems = []
    n_checked = 0
    for node in tree.body:
        if not isinstance(node, ast.FunctionDef) or node.name.startswith("_"):
            continue
        fn = _runtime_callable(node.name)
        if fn is None:
            problems.append(f"{modname}.{node.name}: not found in xsdba_tpu")
            continue
        n_checked += 1
        _check_signature(f"{modname}.{node.name}", node.args, fn, problems)
    assert n_checked >= (18 if modname == "processing" else 25)
    assert not problems, "\n".join(problems)

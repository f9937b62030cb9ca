"""Global/context options — mirrors reference ``options.py:12-83``."""

from __future__ import annotations

import contextlib

__all__ = ["AS_DATASET", "EXTRA_OUTPUT", "OPTIONS", "get_option", "set_options"]

EXTRA_OUTPUT = "extra_output"
AS_DATASET = "as_dataset"

_DEFAULTS = {EXTRA_OUTPUT: False, AS_DATASET: False}
# process-global, like the reference's plain OPTIONS dict (options.py:12-83):
# a main-thread set_options(...) must be visible to worker threads
_GLOBAL_STACK = [dict(_DEFAULTS)]


def _stack():
    return _GLOBAL_STACK


def get_option(name: str):
    return _stack()[-1][name]


class set_options(contextlib.AbstractContextManager):
    """Set options globally or as a context manager.

    >>> with set_options(extra_output=True):
    ...     ...
    """

    def __init__(self, **kwargs):
        bad = set(kwargs) - set(_DEFAULTS)
        if bad:
            raise ValueError(f"Unknown options: {sorted(bad)}")
        new = dict(_stack()[-1])
        new.update(kwargs)
        _stack().append(new)
        self._entered = False

    def __enter__(self):
        self._entered = True
        return self

    def __exit__(self, *exc):
        _stack().pop()
        return False

    def __del__(self):
        # Used without `with`: apply globally (keep on the stack).
        pass


class _OptionsView:
    """Read-only live mapping of the CURRENT option values (reference
    options.py:17-20 exposes a plain ``OPTIONS`` dict; here options are a
    thread-local context stack, so this view always reads the stack top)."""

    def __getitem__(self, name):
        return get_option(name)

    def __iter__(self):
        return iter(_stack()[-1])

    def __len__(self):
        return len(_stack()[-1])

    def __contains__(self, name):
        return name in _stack()[-1]

    def keys(self):
        return _stack()[-1].keys()

    def items(self):
        return _stack()[-1].items()

    def __repr__(self):
        return f"OPTIONS({dict(_stack()[-1])})"


OPTIONS = _OptionsView()

"""Reversible sys.modules stubbing for tests that import reference code.

Several suites import modules from /root/reference read-only and need
stand-ins for dependencies this image lacks (kornia, omegaconf, cv2, ...).
Installing stubs permanently makes the suite order-dependent (VERDICT
round-2 weak #2): a later test may find a leaked, poorer stub instead of
installing its own. Every stub installation now goes through a
ModuleOverlay that records the prior sys.modules entry and can restore it,
and tests that need *specific* stub semantics force-override inside a
scoped overlay instead of checking `if name not in sys.modules`.
"""

from __future__ import annotations

import sys

_MISSING = object()


class ModuleOverlay:
    """Save-and-overwrite sys.modules entries; restore() reinstates priors.

    Usable as a context manager for test-scoped stubs, or held long-lived
    (tests/_torch_ref.py keeps one for the parity stubs and exposes
    uninstall()).
    """

    def __init__(self):
        self._saved = {}

    def set(self, name, module):
        if name not in self._saved:
            self._saved[name] = sys.modules.get(name, _MISSING)
        sys.modules[name] = module

    def restore(self):
        for name, prev in reversed(list(self._saved.items())):
            if prev is _MISSING:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = prev
        self._saved.clear()

    @property
    def active(self):
        return bool(self._saved)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.restore()
        return False

"""Shared shims for importing the reference toolbox under modern NumPy/SciPy.

One place instead of two: ``bench.py`` (reference baseline timing) and
``tools/gen_goldens.py`` (golden generation) previously carried diverging
copies of these shims — a compat fix applied to one silently left the other
falling back (bench's broad ``except`` demotes the baseline to
'local-numpy').  Call :func:`install` BEFORE importing ``ssmtoybox``.
"""
import os
import sys
import types

import numpy as np
import scipy as sp


def install(reference_path: str = "/root/reference") -> None:
    """Make the reference package importable: numba stub, NumPy<1.20 /
    SciPy<1.x aliases, headless matplotlib, historical factorial2."""
    os.environ.setdefault("MPLBACKEND", "Agg")

    # the reference only uses @nb.jit(nopython=True) (utils.py:478)
    numba_stub = types.ModuleType("numba")
    numba_stub.jit = lambda *a, **k: (lambda f: f)
    sys.modules.setdefault("numba", numba_stub)

    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)

    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "bool"):
        np.bool = bool
    if not hasattr(np, "asscalar"):
        np.asscalar = lambda a: np.asarray(a).item()
    if not hasattr(sp, "log10"):
        sp.log10 = np.log10
    if not hasattr(np.linalg, "linalg"):  # np.linalg.linalg.LinAlgError, utils.py:429
        np.linalg.linalg = np.linalg

    # SciPy >= 1.11 changed factorial2(n<0) to return 0; the reference's BSQ
    # polynomial expectations rely on the historical convention (-1)!! = 1
    # (Gaussian moment E[x^0] = (0-1)!!).  Restore the published behaviour.
    import scipy.special as sps
    if not getattr(sps.factorial2, "_refcompat", False):
        orig = sps.factorial2

        def _factorial2_compat(n, exact=False):
            if np.ndim(n) == 0 and int(n) <= 0:
                return 1 if exact else 1.0
            return orig(n, exact=exact)

        _factorial2_compat._refcompat = True
        sps.factorial2 = _factorial2_compat

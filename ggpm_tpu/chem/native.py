"""ctypes bindings to the native chemistry kernel (native/ggpm_chem.cpp).

The native library is an exact semantic mirror of the Python chem kernel —
same canonical strings, same ranks — providing a 20-50× host-side speedup for
the preprocessing pipeline (SMILES canonicalization dominates tensorization
cost).  Loaded opportunistically; every API falls back to Python when the
shared library is absent.

Build:  make -C native     (or: python -m ggpm_tpu.chem.native --build)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', '..', 'native')
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, 'libggpm_chem.so'))


def build_native(verbose: bool = True) -> bool:
    try:
        subprocess.run(['make', '-C', os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=not verbose)
        return True
    except Exception as e:
        if verbose:
            print(f'native build failed: {e}')
        return False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ggpm_canon_smiles.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                          ctypes.c_char_p, ctypes.c_int]
        lib.ggpm_canon_smiles.restype = ctypes.c_int
        lib.ggpm_canon_ranks.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.POINTER(ctypes.c_int),
                                         ctypes.c_int]
        lib.ggpm_canon_ranks.restype = ctypes.c_int
        lib.ggpm_valid.argtypes = [ctypes.c_char_p]
        lib.ggpm_valid.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def canon_smiles_native(smiles: str, kekule: bool = False) -> Optional[str]:
    """Canonical SMILES via the native kernel; None on failure (caller may
    fall back to Python)."""
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(4 * len(smiles) + 256)
    n = lib.ggpm_canon_smiles(smiles.encode(), 1 if kekule else 0, buf,
                              len(buf))
    if n < 0:
        return None
    return buf.value.decode()


def canon_ranks_native(smiles: str, break_ties: bool = False) -> Optional[List[int]]:
    lib = _load()
    if lib is None:
        return None
    cap = 4 * len(smiles) + 64
    arr = (ctypes.c_int * cap)()
    n = lib.ggpm_canon_ranks(smiles.encode(), 1 if break_ties else 0, arr, cap)
    if n < 0:
        return None
    return list(arr[:n])


def valid_native(smiles: str) -> Optional[bool]:
    lib = _load()
    if lib is None:
        return None
    return bool(lib.ggpm_valid(smiles.encode()))


if __name__ == '__main__':
    import sys
    if '--build' in sys.argv:
        ok = build_native()
        print('built' if ok else 'build failed')

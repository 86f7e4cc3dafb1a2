"""High-level chemistry API for ggpm_tpu.

The functional surface the rest of the framework programs against — the
tpu-native replacement for the RDKit calls in the reference's chemistry layer
(/root/reference/ggpm/chemutils.py:17-34, 126-179).
"""

from __future__ import annotations

import functools as _functools
from typing import Iterable, Optional

from .aromatic import kekulize, perceive_aromaticity
from .mol import Atom, Mol
from .parse import mol_from_smiles
from .write import mol_to_smiles


def sanitize_in_place(mol: Mol) -> bool:
    """Kekulize + perceive aromaticity + valence-check.  Returns False when
    the molecule is chemically invalid (over-valent atom or un-kekulizable
    aromatic system)."""
    try:
        if not kekulize(mol):
            return False
    except Exception:
        return False
    perceive_aromaticity(mol)
    for i in range(mol.num_atoms):
        if not mol.valence_ok(i):
            return False
    return True


def get_mol(smiles: str) -> Optional[Mol]:
    """Parse + sanitize + kekulize (reference ``get_mol``, chemutils.py:17-21).
    The returned Mol always carries concrete 1/2/3 bond orders; aromaticity is
    recorded via flags."""
    if smiles is None:
        return None
    return mol_from_smiles(smiles)


@_functools.lru_cache(maxsize=16384)
def get_mol_shared(smiles: str) -> Optional[Mol]:
    """Memoized ``get_mol`` for hot paths that treat the result as
    READ-ONLY (decode-time motif lookups parse the same vocab ismiles
    thousands of times; parse+sanitize was ~45% of steady-state decode).
    Callers must not mutate the returned Mol — clone first if needed."""
    return get_mol(smiles)


import os as _os

_USE_NATIVE = _os.environ.get('GGPM_NATIVE_CHEM', '1') != '0'


def _native_canon(mol: Mol, kekule: bool):
    """Fast path: serialize non-canonically (cheap, no ranking) and let the
    native kernel re-parse + canonicalize.  The native kernel mirrors the
    Python one (differential-tested, tests/test_native.py); mode is constant
    per process so pipeline self-consistency holds."""
    if not _USE_NATIVE:
        return None
    from . import native
    if not native.available():
        return None
    raw = mol_to_smiles(mol, kekule=True, canonical=False)
    return native.canon_smiles_native(raw, kekule=kekule)


def valid_fast(mol: Mol) -> bool:
    """Validity check (kekulize + aromaticity perception + valence) on the
    native kernel when available: serialize non-canonically (a graph walk,
    no ranking) and let C++ parse + sanitize — ~50× the Python sanitize,
    which dominates decode-time assembly dry-runs.  Differential-tested
    against the Python path (tests/test_native.py).  Falls back to the
    Python sanitize when native is unavailable or serialization fails."""
    if _USE_NATIVE:
        from . import native
        if native.available():
            try:
                raw = mol_to_smiles(mol, kekule=True, canonical=False)
            except Exception:
                return sanitize_in_place(mol)
            v = native.valid_native(raw)
            if v is not None:
                return v
    return sanitize_in_place(mol)


def sanitize_smiles_fast(mol: Mol) -> Optional[str]:
    """Sanitize + canonical aromatic SMILES in ONE native call (None when
    the molecule is chemically invalid).  The previous hot path paid a
    Python ``sanitize_in_place`` (valence + aromaticity perception) AND a
    second sanitize inside the native canon; this fuses them — the
    dominant cost of per-sample SMILES extraction after decode."""
    if _USE_NATIVE:
        from . import native
        if native.available():
            try:
                raw = mol_to_smiles(mol, kekule=True, canonical=False)
            except Exception:
                raw = None
            if raw is not None:
                # native is available, so None here = sanitize REJECTED
                return native.canon_smiles_native(raw, kekule=False)
    if sanitize_in_place(mol):
        return mol_to_smiles(mol, kekule=False)
    return None


def get_smiles(mol: Mol) -> str:
    """Canonical kekulé SMILES (reference ``get_smiles``, chemutils.py:24-25)."""
    fast = _native_canon(mol, kekule=True)
    if fast is not None:
        return fast
    return mol_to_smiles(mol, kekule=True)


def get_smiles_aromatic(mol: Mol) -> str:
    """Canonical aromatic-form SMILES (RDKit MolToSmiles default)."""
    fast = _native_canon(mol, kekule=False)
    if fast is not None:
        return fast
    return mol_to_smiles(mol, kekule=False)


def sanitize(mol: Optional[Mol], kekule: bool = True) -> Optional[Mol]:
    """Round-trip through SMILES, mirroring the reference's ``sanitize``
    (chemutils.py:28-34): returns a fresh canonical Mol or None."""
    if mol is None:
        return None
    try:
        smiles = mol_to_smiles(mol, kekule=kekule)
        return mol_from_smiles(smiles)
    except Exception:
        return None


def canon_smiles(smiles: str) -> Optional[str]:
    """Canonicalize a SMILES string (aromatic form); None if unparseable."""
    mol = get_mol(smiles)
    return get_smiles_aromatic(mol) if mol is not None else None


def copy_atom(atom: Atom, with_map: bool = True) -> Atom:
    """Shallow atom copy keeping symbol/charge(/map) only (reference
    ``copy_atom``, chemutils.py:126-132)."""
    a = Atom(atom.symbol, atom.charge)
    if with_map:
        a.map_num = atom.map_num
    return a


def get_sub_mol(mol: Mol, sub_atoms: Iterable[int]) -> Mol:
    """Induced subgraph on ``sub_atoms`` (reference ``get_sub_mol``,
    chemutils.py:136-153).  Atom attributes are copied wholesale (including
    explicit-H and aromatic flags); bonds keep their kekulized orders."""
    sub_atoms = list(sub_atoms)
    new_mol = Mol()
    atom_map = {}
    for idx in sub_atoms:
        atom_map[idx] = new_mol.add_atom(mol.atoms[idx].clone())
    sset = set(sub_atoms)
    for idx in sset:
        for b in mol.bonds_of(idx):
            j = b.other(idx)
            if j in sset and idx < j:
                new_mol.add_bond(atom_map[idx], atom_map[j], b.order, b.aromatic)
    return new_mol


def copy_edit_mol(mol: Mol) -> Mol:
    """Deep copy keeping only symbol/charge/map and bond orders (reference
    ``copy_edit_mol``, chemutils.py:156-170)."""
    new_mol = Mol()
    for a in mol.atoms:
        new_mol.add_atom(copy_atom(a))
    for b in mol.bonds:
        new_mol.add_bond(b.a1, b.a2, b.order, b.aromatic)
    return new_mol


def get_clique_mol(mol: Mol, atoms: Iterable[int]) -> Optional[Mol]:
    """Extract the induced fragment and resanitize it as a standalone molecule
    (reference ``get_clique_mol``, chemutils.py:173-179).  Bond orders come
    from the kekulized parent, so partial aromatic rings keep valid valences."""
    frag = get_sub_mol(mol, atoms)
    # fragment atoms lose ring context: recompute aromaticity from scratch
    for a in frag.atoms:
        a.aromatic = False
    for b in frag.bonds:
        b.aromatic = False
    ok = sanitize_in_place(frag)
    return frag if ok else None


def atom_equal(a1: Atom, a2: Atom) -> bool:
    """Symbol+charge equality (reference chemutils.py:116-117)."""
    return a1.symbol == a2.symbol and a1.charge == a2.charge


def bond_match(mol1: Mol, a1: int, b1: int, mol2: Mol, a2: int, b2: int) -> bool:
    """Endpoint-typed bond match (reference chemutils.py:120-123)."""
    return atom_equal(mol1.atoms[a1], mol2.atoms[a2]) and \
        atom_equal(mol1.atoms[b1], mol2.atoms[b2])

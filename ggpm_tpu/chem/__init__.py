"""ggpm_tpu.chem — self-contained cheminformatics kernel.

A from-scratch replacement for the RDKit subset the GGPM pipeline needs:
SMILES parse/write, kekulization, aromaticity perception, SSSR, canonical
ranking, molecular editing, and Morgan fingerprints.  Everything here is
host-side Python (with optional native acceleration, see ``native/``); the
learned compute path lives in ``ggpm_tpu.models`` as JAX/Pallas code.
"""

from .api import (atom_equal, bond_match, canon_smiles, copy_atom,
                  copy_edit_mol, get_clique_mol, get_mol, get_mol_shared, get_smiles, valid_fast,
                  get_smiles_aromatic, get_sub_mol, sanitize,
                  sanitize_in_place, sanitize_smiles_fast)
from .brics import brics_decompose, brics_fragments, find_brics_bonds
from .canon import canonical_ranks
from .fingerprint import morgan_bits, tanimoto, tanimoto_smiles
from .sascore import FragmentScores, calculate_sa, morgan_frag_counts
from .mol import AROMATIC, BOND_TYPES, DOUBLE, SINGLE, TRIPLE, Atom, Bond, Mol
from .parse import mol_from_smiles
from .write import mol_to_smiles

__all__ = [
    'Atom', 'Bond', 'Mol', 'SINGLE', 'DOUBLE', 'TRIPLE', 'AROMATIC',
    'BOND_TYPES', 'mol_from_smiles', 'mol_to_smiles', 'canonical_ranks',
    'get_mol', 'get_mol_shared', 'get_smiles', 'valid_fast', 'get_smiles_aromatic', 'canon_smiles',
    'sanitize', 'sanitize_in_place', 'sanitize_smiles_fast',
    'get_sub_mol', 'get_clique_mol',
    'copy_edit_mol', 'copy_atom', 'atom_equal', 'bond_match',
    'morgan_bits', 'tanimoto', 'tanimoto_smiles',
    'brics_decompose', 'brics_fragments', 'find_brics_bonds',
    'FragmentScores', 'calculate_sa', 'morgan_frag_counts',
]

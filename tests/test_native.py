"""Differential tests: native C++ chem kernel vs the Python reference
implementation.  Skipped when the shared library hasn't been built
(``make -C native``)."""


import pytest

from ggpm_tpu.chem import canonical_ranks, mol_from_smiles, mol_to_smiles
from ggpm_tpu.chem import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native library not built')


def _py_canon(smiles, kekule):
    m = mol_from_smiles(smiles)
    return None if m is None else mol_to_smiles(m, kekule=kekule)


CASES = [
    'c1ccccc1', 'C1=CC=CC=C1', 'Cc1ccccc1', 'c1ccc2ccccc2c1', 'c1ccsc1',
    'c1cc[nH]c1', 'CC(=O)Nc1ccccc1', 'CCO', '[NH4+]', 'O=C1OCCC1',
    'c1ccc(-c2ccccc2)cc1', 'Cn1cccc1', 'C[Si](C)(C)C', '[se]1cccc1',
    'CN1C(=O)c2ccccc2C1=O', 'N#Cc1ccccc1', 'F/C=C/F',
    'CC(C)(C)c1ccc(O)cc1', 'C#C', 'CC1=CC=C(C)S1',
]


@pytest.mark.parametrize('smiles', CASES)
def test_canon_agreement(smiles):
    for kek in (False, True):
        assert native.canon_smiles_native(smiles, kek) == _py_canon(smiles, kek)


@pytest.mark.parametrize('smiles', CASES)
def test_rank_agreement(smiles):
    m = mol_from_smiles(smiles)
    for bt in (False, True):
        assert native.canon_ranks_native(smiles, bt) == canonical_ranks(m, bt)


def test_invalid_rejected():
    assert native.valid_native('C(C)(C)(C)(C)C') is False
    assert native.valid_native('not-smiles') is False
    assert native.valid_native('c1ccccc1') is True


def test_dataset_agreement_rate():
    """Bulk agreement over real dataset molecules.  A handful of degenerate
    fused systems (hypervalent [SH]-aromatic artifacts) may pick different
    SSSR bases; require ≥99% exact string agreement."""
    smiles = []
    for f in ['/root/reference/data/chem_data/train.csv']:
        smiles += [l.split(',')[0].strip('"').strip()
                   for l in open(f).read().splitlines()[1:] if l.strip()]
    smiles += [l.strip() for l in
               open('/root/reference/data/polymers/valid.txt').read().splitlines()[:100]]
    smiles = [s for s in smiles if s]
    agree = total = 0
    for s in smiles:
        p = _py_canon(s, False)
        n = native.canon_smiles_native(s, False)
        if p is None and n is None:
            continue
        total += 1
        agree += (p == n)
    assert total > 0
    assert agree / total >= 0.99


def test_valid_fast_matches_python_sanitize():
    """valid_fast (serialize → native parse+sanitize) must agree with the
    Python sanitize on decode-style merged fragments: valid molecules,
    over-valent corruptions, and raw sub-fragments."""
    import copy

    from ggpm_tpu.chem import get_mol, get_sub_mol, sanitize_in_place, \
        valid_fast
    from ggpm_tpu.chem.mol import Mol

    smiles = [l.split(',')[0].strip('"').strip()
              for l in open('/root/reference/data/chem_data/train.csv')
              .read().splitlines()[1:] if l.strip()][:30]
    checked = 0
    for s in smiles:
        mol = get_mol(s)
        if mol is None:
            continue
        cases = [mol]
        # induced fragment with cleared flags — matches the decode merge
        # state: try_add_mol's tmp only ever contains atoms added through
        # copy_atom (aromatic=False), so stale atom flags cannot occur
        # (serialization drops flags, so flag-inconsistent inputs are the
        # one place the two paths may differ — see get_clique_mol)
        if mol.num_atoms >= 6:
            frag = get_sub_mol(mol, range(mol.num_atoms // 2))
            for a in frag.atoms:
                a.aromatic = False
            cases.append(frag)
        # over-valent corruption: bump a bond order (as a plain aliphatic
        # bond — decode merges only ever add kekulized, flag-consistent
        # bonds, so an aromatic-flagged bond with a wrong order cannot
        # occur and would serialize by flag)
        bad = copy.deepcopy(mol)
        if bad.num_bonds >= 2:
            for a in bad.atoms:
                a.aromatic = False
            # make one atom unambiguously over-valent: two triple bonds
            a0 = bad.bonds[0].a1
            bad.bonds[0].order = 3
            bad.bonds[0].aromatic = False
            for b in bad.bonds_of(a0):
                b.order = 3
                b.aromatic = False
            cases.append(bad)
        for m in cases:
            py = sanitize_in_place(copy.deepcopy(m))
            fast = valid_fast(copy.deepcopy(m))
            assert py == fast, f'{s}: python={py} native={fast}'
            checked += 1
    assert checked >= 60

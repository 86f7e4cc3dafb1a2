"""Chemistry-kernel tests: parsing, canonicalization, kekulization, rings,
editing, fingerprints."""

import pytest

from ggpm_tpu.chem import (Atom, canon_smiles, canonical_ranks, get_mol,
                           get_smiles, get_smiles_aromatic, get_sub_mol,
                           morgan_bits, sanitize_in_place, tanimoto,
                           tanimoto_smiles)


CASES = [
    'c1ccccc1', 'C1=CC=CC=C1', 'Cc1ccccc1', 'c1ccc2ccccc2c1', 'c1ccsc1',
    'C1=CC=CS1', 'c1cc[nH]c1', 'c1ccncc1', 'CC(=O)Nc1ccccc1', 'C#N',
    'CCO', 'C', '[NH4+]', 'O=C1OCCC1', 'c1ccc(-c2ccccc2)cc1',
    'Cn1cccc1', 'c1ccoc1', 'F/C=C/F', 'C[Si](C)(C)C', '[se]1cccc1',
    'CC(C)(C)c1ccc(O)cc1', 'N#Cc1ccccc1',
    'CN1c2ccccc2C(=C2c3ccc(-c4cccs4)cc3N(C)C2=O)C1=O',
]


@pytest.mark.parametrize('smiles', CASES)
def test_roundtrip_idempotent(smiles):
    m = get_mol(smiles)
    assert m is not None, smiles
    a = get_smiles_aromatic(m)
    k = get_smiles(m)
    m2, m3 = get_mol(a), get_mol(k)
    assert m2 is not None and m3 is not None
    assert get_smiles_aromatic(m2) == a
    assert get_smiles(m3) == k
    # aromatic and kekulé forms describe the same molecule
    assert get_smiles_aromatic(m3) == a


def test_kekule_aromatic_equivalence():
    assert canon_smiles('c1ccccc1') == canon_smiles('C1=CC=CC=C1')
    assert canon_smiles('c1ccsc1') == canon_smiles('C1=CC=CS1')
    # the two kekulé forms of toluene's ring agree
    assert canon_smiles('Cc1ccccc1') == canon_smiles('CC1=CC=CC=C1')


def test_invalid_molecules_rejected():
    assert get_mol('C(C)(C)(C)(C)C') is None          # 5-valent carbon
    assert get_mol('totally-not-smiles') is None
    assert get_mol('C1CC') is None                    # unclosed ring


def test_implicit_hydrogens():
    m = get_mol('CCO')
    assert [m.total_h(i) for i in range(3)] == [3, 2, 1]
    m = get_mol('c1cc[nH]c1')
    n_idx = next(i for i, a in enumerate(m.atoms) if a.symbol == 'N')
    assert m.total_h(n_idx) == 1


def test_sssr_counts():
    assert len(get_mol('c1ccccc1').sssr()) == 1
    assert len(get_mol('c1ccc2ccccc2c1').sssr()) == 2
    assert len(get_mol('C1CC1').sssr()) == 1
    assert len(get_mol('CCCC').sssr()) == 0
    # spiro
    assert len(get_mol('C1CCC2(CC1)CCCC2').sssr()) == 2


def test_ring_membership():
    m = get_mol('Cc1ccccc1')
    methyl = next(i for i in range(m.num_atoms) if m.degree(i) == 1
                  and m.atoms[i].symbol == 'C' and not m.atom_in_ring(i))
    assert not m.atom_in_ring(methyl)
    assert sum(m.atom_in_ring(i) for i in range(m.num_atoms)) == 6


def test_editing_and_rollback():
    m = get_mol('CCO')
    n0 = m.num_atoms
    idx = m.add_atom(Atom('C'))
    m.add_bond(0, idx, 1)
    assert m.num_atoms == n0 + 1
    m.remove_bond(0, idx)
    m.remove_atom(idx)
    assert m.num_atoms == n0
    assert get_smiles(m) == get_smiles(get_mol('CCO'))


def test_sub_mol():
    m = get_mol('CC(=O)Nc1ccccc1')
    ring = [i for i in range(m.num_atoms) if m.atom_in_ring(i)]
    sub = get_sub_mol(m, ring)
    assert sub.num_atoms == 6
    assert sanitize_in_place(sub)
    assert canon_smiles(get_smiles(sub)) == canon_smiles('c1ccccc1')


def test_canonical_ranks_symmetry():
    m = get_mol('c1ccccc1')
    ranks = canonical_ranks(m, break_ties=False)
    assert len(set(ranks)) == 1  # all carbons equivalent
    m = get_mol('Cc1ccccc1')
    ranks = canonical_ranks(m, break_ties=False)
    # toluene: methyl, ipso, 2×ortho, 2×meta, para → 5 classes
    assert len(set(ranks)) == 5
    full = canonical_ranks(m, break_ties=True)
    assert sorted(full) == list(range(m.num_atoms))


def test_atom_maps_roundtrip():
    m = get_mol('C#C')
    m.atoms[0].map_num = 1
    s = get_smiles(m)
    assert ':1' in s
    m2 = get_mol(s)
    assert sum(a.map_num for a in m2.atoms) == 1


def test_fingerprints():
    a = morgan_bits(get_mol('c1ccccc1'))
    b = morgan_bits(get_mol('c1ccccc1'))
    c = morgan_bits(get_mol('CCCCCC'))
    assert tanimoto(a, b) == 1.0
    assert tanimoto(a, c) < 0.5
    assert tanimoto_smiles('c1ccccc1', 'Cc1ccccc1') > 0.1


def test_charges_and_brackets():
    for s in ['[NH4+]', '[O-]C(=O)C', 'C[N+](C)(C)C', '[SiH3]C']:
        m = get_mol(s)
        assert m is not None, s
        assert get_mol(get_smiles_aromatic(m)) is not None


def test_dataset_parse_rate():
    smiles = [l.strip() for l in
              open('/root/reference/data/polymers/valid.txt')][:150]
    ok = sum(1 for s in smiles if get_mol(s) is not None)
    assert ok >= len(smiles) * 0.99


def test_fuzz_roundtrip_dataset_molecules():
    """Property-based round-trip over a random sample of real dataset
    molecules: canonical idempotence and kekulé/aromatic equivalence."""
    import random
    rng = random.Random(7)
    pool = [l.strip() for l in
            open('/root/reference/data/polymers/test.txt')][:2000]
    sample = rng.sample(pool, 60)
    for s in sample:
        m = get_mol(s)
        if m is None:
            continue
        a = get_smiles_aromatic(m)
        k = get_smiles(m)
        m2, m3 = get_mol(a), get_mol(k)
        assert m2 is not None and m3 is not None, s
        assert get_smiles_aromatic(m2) == a, s
        assert get_smiles_aromatic(m3) == a, s
        # random atom-map round trip
        idx = rng.randrange(m.num_atoms)
        m.atoms[idx].map_num = 1
        s_mapped = get_smiles(m)
        m4 = get_mol(s_mapped)
        assert m4 is not None and sum(x.map_num for x in m4.atoms) == 1, s


# --- Ertl SA score (chem/sascore.py) ---------------------------------------

def test_sa_score_range_and_ordering():
    """SA scores live in [1, 10] and complexity raises them: a bridged
    polycycle with stereocentres must score higher than ethanol."""
    from ggpm_tpu.chem import FragmentScores, calculate_sa, get_mol
    corpus_smiles = ['CCO', 'CCC', 'c1ccccc1', 'CC(=O)O', 'CCN', 'CCOC',
                     'c1ccncc1', 'CC(C)O', 'CCCC', 'CC(N)C(=O)O']
    fscores = FragmentScores.fit([get_mol(s) for s in corpus_smiles])
    simple = calculate_sa(get_mol('CCO'), fscores)
    complex_ = calculate_sa(
        get_mol('CC1(C)C2CCC1(C)C(=O)C2'), fscores)  # camphor-like bridged
    assert 1.0 <= simple <= 10.0 and 1.0 <= complex_ <= 10.0
    assert complex_ > simple


def test_sa_stereocenters():
    from ggpm_tpu.chem import get_mol
    from ggpm_tpu.chem.sascore import num_potential_stereocenters
    assert num_potential_stereocenters(get_mol('CC(N)C(=O)O')) == 1  # alanine
    assert num_potential_stereocenters(get_mol('CC(C)C')) == 0
    assert num_potential_stereocenters(get_mol('c1ccccc1')) == 0


def test_sa_ring_topology():
    from ggpm_tpu.chem import get_mol
    from ggpm_tpu.chem.sascore import _ring_topology
    spiro, bridge, macro = _ring_topology(get_mol('C1CCC2(CC1)CCCCC2'))
    assert spiro == 1 and bridge == 0
    spiro, bridge, macro = _ring_topology(get_mol('C1CC2CCC1CC2'))
    assert bridge == 2 and spiro == 0
    _, _, macro = _ring_topology(get_mol('C1CCCCCCCCCCC1'))
    assert macro == 1


def test_fragment_scores_roundtrip(tmp_path):
    from ggpm_tpu.chem import FragmentScores, get_mol
    fs = FragmentScores.fit([get_mol('CCO'), get_mol('CCC')])
    p = str(tmp_path / 'fs.json')
    fs.save(p)
    fs2 = FragmentScores.load(p)
    assert fs.scores == fs2.scores
    assert fs2.get(123456789) == FragmentScores.FLOOR  # unseen → floor


# --- BRICS fragmentation (chem/brics.py) ------------------------------------

def test_brics_ether_cut():
    # both ether bonds cut: L3-L4 (O-CCC) and L3-L16 (O-aryl), as RDKit's
    # BRICSDecompose does ('[3*]O[3*]', '[4*]CCC', '[16*]c1ccccc1')
    from ggpm_tpu.chem import brics_decompose
    frags = brics_decompose('CCCOc1ccccc1')
    assert sorted(frags) == ['CCC', 'O', 'c1ccccc1']


def test_brics_no_ring_bond_cut():
    from ggpm_tpu.chem import brics_decompose, find_brics_bonds, get_mol
    assert find_brics_bonds(get_mol('C1CCOC1')) == []
    assert brics_decompose('C1CCOC1') == ['C1CCOC1']


def test_brics_biphenyl():
    from ggpm_tpu.chem import brics_decompose
    assert brics_decompose('c1ccc(-c2ccccc2)cc1') == \
        ['c1ccccc1', 'c1ccccc1']


def test_brics_amide():
    """Acetanilide: amide C–N (L1–L5) and anilino N–c (L5–L16) both cleave."""
    from ggpm_tpu.chem import find_brics_bonds, get_mol
    cuts = find_brics_bonds(get_mol('CC(=O)Nc1ccccc1'))
    assert len(cuts) == 2


def test_brics_consistency_over_dataset(golden_smiles):
    """BRICS decomposition never throws and every fragment reparses."""
    from ggpm_tpu.chem import brics_decompose, get_mol
    for s in golden_smiles:
        frags = brics_decompose(s)
        if frags is None:
            continue
        assert len(frags) >= 1
        for f in frags:
            assert get_mol(f) is not None, f'{f} from {s} does not reparse'


def test_sanitize_idempotent():
    """Re-sanitizing an already-sanitized molecule must succeed (kekulize
    once mis-read kekulé pyrrole-type N as pyridine-type on the second
    pass because perceived aromatic flags changed the H inference)."""
    import copy

    from ggpm_tpu.chem import get_mol, sanitize_in_place

    for s in ['C1=CC=CN1', 'c1cc[nH]c1', 'c1ccncc1', 'c1ccc2[nH]ccc2c1',
              'c1ccsc1', 'c1ccoc1', 'O=C1C=CC(=O)c2ccccc21']:
        mol = get_mol(s)
        assert mol is not None, s
        for _ in range(3):
            assert sanitize_in_place(mol), s
            m2 = copy.deepcopy(mol)
            assert sanitize_in_place(m2), s

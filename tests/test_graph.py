"""Graph-layer tests: decomposition invariants on the reference's golden
molecules, vocabulary, tensorization shapes, padding."""

import numpy as np
import pytest

from ggpm_tpu.data.batching import pad_batch
from ggpm_tpu.graph.mol_graph import MolGraph, tensorize
from ggpm_tpu.graph.vocab import common_atom_vocab


def test_decomposition_invariants(golden_smiles):
    MolGraph.FRAGMENTS = set()
    for s in golden_smiles:
        h = MolGraph(s)
        n_atoms = h.mol.num_atoms
        covered = {a for c in h.clusters for a in c}
        assert covered == set(range(n_atoms))
        # tree is connected and order visits every node
        nodes = set(x for x, y, t in h.order) | \
            {y for x, y, t in h.order if y is not None}
        assert nodes == set(h.mol_tree.nodes)
        # DFS order: expansions == backtracks (plus final root stop)
        ups = sum(1 for _, _, t in h.order if t == 1)
        downs = sum(1 for _, _, t in h.order if t == 0)
        assert downs == ups + 1
        # labels exist on every node
        for _, d in h.mol_tree.nodes(data=True):
            assert isinstance(d['label'], tuple)
            assert d['cluster']


def test_assm_cands_label_first(golden_smiles):
    """Reference invariant: the gold assembly candidate is index 0
    (mol_graph.py:167, decoder label=0)."""
    MolGraph.FRAGMENTS = set()
    found = 0
    for s in golden_smiles:
        h = MolGraph(s)
        for _, d in h.mol_tree.nodes(data=True):
            cands = d['assm_cands']
            if cands:
                found += 1
                assert isinstance(cands[0], (int, tuple, np.integer))
    assert found > 0


def test_tensorize_shapes(golden_smiles, golden_vocab):
    MolGraph.FRAGMENTS = set()
    batch = [[s, -5.0, 1.0] for s in golden_smiles[:6]]
    mb = tensorize(batch, golden_vocab, common_atom_vocab)
    nt = mb.tree.fnode.shape[0]
    mt = mb.tree.fmess.shape[0]
    assert (mb.tree.fnode[0] == mb.tree.fnode[1]).all()
    assert mb.tree.agraph.shape[0] == nt
    assert mb.tree.bgraph.shape[0] == mt
    assert mb.plan.xid.max() < nt
    assert mb.plan.mess.max() < mt
    # virtual slots present for every molecule
    assert (mb.tree.agraph_dec >= mt).sum() == len(batch)
    # messages referenced by steps are within range; labels in vocab range
    hv, iv = golden_vocab.size()
    assert mb.plan.clab.max() < hv and mb.plan.ilab.max() < iv
    # scope covers all tree nodes
    assert mb.tree.scope[:, 1].sum() == nt - 1


def test_padding_preserves_semantics(golden_smiles, golden_vocab):
    MolGraph.FRAGMENTS = set()
    batch = [[s, -5.0, 1.0] for s in golden_smiles[:4]]
    mb = tensorize(batch, golden_vocab, common_atom_vocab)
    nt, mt = mb.tree.fnode.shape[0], mb.tree.fmess.shape[0]
    pb = pad_batch(mb)
    # original data untouched
    assert (pb.tree.fnode[:nt] == mb.tree.fnode).all()
    assert (pb.tree.fmess[:mt] == mb.tree.fmess).all()
    # virtual slot rebasing: entries that pointed past mt now point past
    # padded message count
    pmt = pb.tree.fmess.shape[0]
    assert (pb.tree.agraph_dec >= pmt).sum() == len(batch)
    # padding area is zeros
    assert pb.tree.fmess[mt:].sum() == 0


def test_vocab_mask(golden_vocab):
    hv, iv = golden_vocab.size()
    assert golden_vocab.mask.shape == (hv, iv)
    # each row has at least one allowed entry (0.0)
    assert ((golden_vocab.mask == 0).sum(axis=1) >= 1).all()
    # lookups agree with the mask
    for (h, s), idx in list(golden_vocab.vmap.items())[:10]:
        hid = golden_vocab.hmap[h]
        assert golden_vocab.mask[hid, idx] == 0.0


def test_fragment_pooling(golden_smiles):
    """With a frequent fragment loaded, clusters inside it merge."""
    from ggpm_tpu.data.vocab_extract import build_vocab
    smiles = golden_smiles
    rows, frags = build_vocab(smiles, min_frequency=3)
    if not frags:
        pytest.skip('no frequent fragments at this threshold')
    h = MolGraph(smiles[0])
    assert {a for c in h.clusters for a in c} == set(range(h.mol.num_atoms))
    MolGraph.FRAGMENTS = set()


def test_bucket_signature_budget(golden_smiles, golden_vocab):
    """Joint size-class bucketing keeps the number of distinct compile
    signatures small across heterogeneous batches (compile-time guard)."""
    MolGraph.FRAGMENTS = set()
    sigs = set()
    for i in range(0, 12, 3):
        mb = tensorize([[s, None, None] for s in golden_smiles[i:i + 3]],
                       golden_vocab, common_atom_vocab)
        pb = pad_batch(mb)
        sigs.add((pb.tree.fnode.shape, pb.tree.fmess.shape,
                  pb.graph.fnode.shape, pb.graph.fmess.shape,
                  pb.plan.active.shape, pb.tree.agraph.shape[1],
                  pb.tree.cgraph.shape[1], pb.graph.agraph.shape[1]))
        # joint scaling: message dim is always 2x node dim etc.
        assert pb.tree.fmess.shape[0] == 2 * pb.tree.fnode.shape[0]
        assert pb.graph.fmess.shape[0] == 2 * pb.graph.fnode.shape[0]
    assert len(sigs) <= 3


def test_decomposition_golden(golden_smiles):
    """Frozen decomposition outputs — any silent change to the chem kernel or
    graph layer that alters clusters/orders/labels breaks vocabulary
    compatibility with previously trained checkpoints and must be explicit
    (regenerate tests/goldens/decomposition.json deliberately)."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), 'goldens',
                        'decomposition.json')
    golden = json.load(open(path))
    MolGraph.FRAGMENTS = set()
    for s in golden_smiles:
        h = MolGraph(s)
        g = golden[s]
        assert [sorted(int(a) for a in c) for c in h.clusters] == g['clusters']
        assert [[int(x), None if y is None else int(y), int(t)]
                for x, y, t in h.order] == g['order']
        labels = {str(i): list(d['label'])
                  for i, d in h.mol_tree.nodes(data=True)}
        assert labels == g['labels']
        counts = {str(i): len(d['assm_cands'])
                  for i, d in h.mol_tree.nodes(data=True)}
        assert counts == g['assm_cands_count']

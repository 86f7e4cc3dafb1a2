"""Datasets and the sharded training-data iterator.

Reference: /root/reference/ggpm/dataset.py:17-118 (MoleculeDataset pruning,
DataFolder pickled-shard iterator, MolPairDataset, MolEnumRootDataset).
Tensorized batches are ``MolGraphBatch`` objects (already padded numpy) —
ready for ``to_model_batch`` without further host work in the train loop.
"""

from __future__ import annotations

import gc
import os
import pickle
import random
from typing import List, Optional, Sequence

from ..chem import get_mol, mol_to_smiles
from ..graph.chemutils import get_leaves
from ..graph.mol_graph import MolGraph, tensorize


def prune_to_vocab(data: Sequence, vocab, verbose: bool = True) -> List:
    """Drop molecules whose motif or attachment labels fall outside the vocab
    (reference MoleculeDataset.__init__, dataset.py:19-34)."""
    safe_data = []
    for row in data:
        mol_s = row[0]
        try:
            hmol = MolGraph(mol_s)
        except Exception:
            continue
        ok = True
        for _, attr in hmol.mol_tree.nodes(data=True):
            smiles = attr['smiles']
            ok &= attr['label'] in vocab
            for _, s in attr['inter_label']:
                ok &= (smiles, s) in vocab
        if ok:
            safe_data.append(list(row))
    if verbose:
        print(f'After pruning {len(data)} -> {len(safe_data)}')
    return safe_data


class MoleculeDataset:
    """Prunes out-of-vocab molecules, then tensorizes per batch on access."""

    def __init__(self, data, vocab, avocab, batch_size: int):
        safe_data = prune_to_vocab(data, vocab)
        self.batches = [safe_data[i:i + batch_size]
                        for i in range(0, len(safe_data), batch_size)]
        self.vocab = vocab
        self.avocab = avocab

    def __len__(self):
        return len(self.batches)

    def __getitem__(self, idx):
        return tensorize(self.batches[idx], self.vocab, self.avocab)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class MolEnumRootDataset:
    """Enumerate alternative SMILES rootings at leaves for robust
    reconstruction (reference dataset.py:46-75)."""

    def __init__(self, data: Sequence[str], vocab, avocab):
        self.batches = list(data)
        self.vocab = vocab
        self.avocab = avocab

    def __len__(self):
        return len(self.batches)

    def __getitem__(self, idx):
        mol = get_mol(self.batches[idx])
        if mol is None:
            return None
        leaves = get_leaves(mol)
        smiles_list = sorted({mol_to_smiles(mol, root=i) for i in leaves})
        safe_list = []
        for s in smiles_list:
            try:
                hmol = MolGraph(s)
            except Exception:
                continue
            if all(attr['label'] in self.vocab
                   for _, attr in hmol.mol_tree.nodes(data=True)):
                safe_list.append(s)
        if not safe_list:
            return None
        return tensorize([[s, None, None] for s in safe_list],
                         self.vocab, self.avocab)


class MolPairDataset:
    """Graph-to-graph (x → y) pairs (reference dataset.py:78-92)."""

    def __init__(self, data, vocab, avocab, batch_size: int):
        self.batches = [data[i:i + batch_size]
                        for i in range(0, len(data), batch_size)]
        self.vocab = vocab
        self.avocab = avocab

    def __len__(self):
        return len(self.batches)

    def __getitem__(self, idx):
        x, y = zip(*self.batches[idx])
        xb = tensorize([[s, None, None] for s in x], self.vocab, self.avocab)
        yb = tensorize([[s, None, None] for s in y], self.vocab, self.avocab)
        return xb, yb


class DataFolder:
    """Iterator over preprocessed pickle shards, shuffling batch order per
    shard (reference dataset.py:95-118).  With ``num_shards``/``shard_index``
    set, each host process reads a disjoint subset of files — the multi-host
    data-parallel input path."""

    def __init__(self, data_folder: str, batch_size: int, shuffle: bool = True,
                 num_shards: int = 1, shard_index: int = 0,
                 seed: Optional[int] = None):
        self.data_folder = data_folder
        files = sorted(os.listdir(data_folder))
        self.data_files = files[shard_index::num_shards]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.data_files) * 1000

    def __iter__(self):
        for fn in self.data_files:
            with open(os.path.join(self.data_folder, fn), 'rb') as f:
                batches = pickle.load(f)
            if self.shuffle:
                self.rng.shuffle(batches)
            yield from batches
            del batches
            gc.collect()

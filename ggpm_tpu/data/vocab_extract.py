"""Motif-vocabulary extraction and preprocessing (library + CLI core).

Reference: /root/reference/get_vocab.py (two-pass fragment-frequency +
label collection), /root/reference/preprocess.py (tensorize + pickle shards),
/root/reference/merge_vocab.py (order-preserving union).
"""

from __future__ import annotations

import os
import pickle
import random
from collections import Counter
from multiprocessing import Pool
from typing import List, Sequence, Tuple

from ..chem import canon_smiles, get_mol
from ..graph.chemutils import find_fragments
from ..graph.mol_graph import MolGraph, tensorize
from .batching import pad_batch


def fragment_counts(smiles_list: Sequence[str]) -> Counter:
    """Pass 1: count motif fragments (reference get_vocab.py:30-40)."""
    counter: Counter = Counter()
    for smiles in smiles_list:
        try:
            mol = get_mol(smiles)
            if mol is None:
                continue
            for fsmiles, _ in find_fragments(mol):
                counter[fsmiles] += 1
        except Exception as e:
            print(f'Error at {smiles}: {e}')
    return counter


def collect_labels(smiles_list: Sequence[str]) -> set:
    """Pass 2: collect (smiles, ismiles) labels incl. anchor pairs
    (reference get_vocab.py:11-27)."""
    vocab = set()
    for i, line in enumerate(smiles_list):
        try:
            line = line.strip('\r\n ')
            hmol = MolGraph(line)
            for _, attr in hmol.mol_tree.nodes(data=True):
                smiles = attr['smiles']
                vocab.add(attr['label'])
                for _, s in attr['inter_label']:
                    vocab.add((smiles, s))
        except Exception as e:
            print(f'Error at line {i} ({line}): {e}')
    return vocab


def build_vocab(smiles_list: Sequence[str], min_frequency: int = 100,
                ncpu: int = 1) -> Tuple[List[Tuple[str, str, bool]], set]:
    """Full two-pass vocabulary build.  Returns ([(smiles, ismiles,
    is_frequent_fragment)], fragment_set)."""
    smiles_list = [s for s in dict.fromkeys(smiles_list) if s]
    if ncpu > 1:
        bs = len(smiles_list) // ncpu + 1
        chunks = [smiles_list[i:i + bs] for i in range(0, len(smiles_list), bs)]
        with Pool(ncpu) as pool:
            counters = pool.map(fragment_counts, chunks)
        counter = Counter()
        for c in counters:
            counter += c
    else:
        counter = fragment_counts(smiles_list)

    fragments = [f for f, cnt in counter.most_common() if cnt >= min_frequency]
    MolGraph.load_fragments(fragments)
    fragment_set = set(fragments)

    if ncpu > 1:
        with Pool(ncpu) as pool:
            vocab_sets = pool.map(collect_labels, chunks)
        vocab = set().union(*vocab_sets)
    else:
        vocab = collect_labels(smiles_list)

    rows = []
    for x, y in sorted(vocab):
        cx = canon_smiles(x)
        rows.append((x, y, cx in fragment_set))
    return rows, fragment_set


def write_vocab(rows, path: str) -> None:
    with open(path, 'w') as f:
        f.write('\n'.join(' '.join([x, y, str(flag)]) for x, y, flag in rows))


def load_vocab_file(path: str):
    """Load a vocab file and return (PairVocab, fragment list); also loads
    the frequent fragments into MolGraph (reference vae_train.py:28-30).

    Accepts both the 3-column ``smiles ismiles bool`` format this repo
    writes and the reference's 2-column ``smiles ismiles`` files (e.g.
    ``data/chembl/vocab.txt``), whose rows carry no fragment flag."""
    from ..graph.vocab import PairVocab
    lines = [x.strip('\r\n ').split() for x in open(path) if x.strip()]
    fragments = [x[0] for x in lines if len(x) >= 3 and x[-1] == 'True']
    MolGraph.load_fragments(fragments)
    return PairVocab([(x[0], x[1]) for x in lines]), fragments


def merge_vocabs(paths: Sequence[str]) -> List[str]:
    """Order-preserving union of vocab files (reference merge_vocab.py),
    keyed on the (smiles, ismiles) pair so the same entry appearing with
    and without a fragment flag merges into one row (flags OR together)."""
    seen: dict = {}
    for p in paths:
        for line in open(p):
            parts = line.split()
            if len(parts) < 2:
                continue
            key = (parts[0], parts[1])
            flag = len(parts) >= 3 and parts[2] == 'True'
            seen[key] = seen.get(key, False) or flag
    return [f'{x} {y} {flag}' for (x, y), flag in seen.items()]


def _tensorize_chunk(args):
    batches, vocab, avocab, do_pad = args
    out = []
    for batch in batches:
        try:
            mb = tensorize(batch, vocab, avocab)
            out.append(pad_batch(mb) if do_pad else mb)
        except Exception as e:
            print(f'tensorize error: {e}')
    return out


def tensorize_batches(batches: Sequence, vocab, avocab, ncpu: int = 1,
                      pad: bool = True):
    """Tensorize (and optionally pad) pre-split molecule batches, fanning
    out over ``ncpu`` processes (the reference preprocesses with a
    multiprocessing Pool too, preprocess.py:57-63)."""
    if ncpu > 1 and len(batches) > ncpu:
        bs = len(batches) // ncpu + 1
        chunks = [(list(batches[i:i + bs]), vocab, avocab, pad)
                  for i in range(0, len(batches), bs)]
        with Pool(ncpu) as pool:
            results = pool.map(_tensorize_chunk, chunks)
        return [b for r in results for b in r]
    return _tensorize_chunk((list(batches), vocab, avocab, pad))


def preprocess_to_shards(data: Sequence, vocab, avocab, out_dir: str,
                         batch_size: int = 20, batches_per_shard: int = 1000,
                         ncpu: int = 1, seed: int = 1, pad: bool = True) -> int:
    """Tensorize and pickle training shards (reference preprocess.py:45-78).
    Emits padded fixed-shape batches so the training loop does zero host
    tensor work."""
    random.seed(seed)
    data = list(data)
    random.shuffle(data)
    batches = [data[i:i + batch_size] for i in range(0, len(data), batch_size)]
    # drop the trailing partial batch to keep shapes static
    batches = [b for b in batches if len(b) == batch_size]

    if ncpu > 1:
        bs = len(batches) // ncpu + 1
        chunks = [(batches[i:i + bs], vocab, avocab, pad)
                  for i in range(0, len(batches), bs)]
        with Pool(ncpu) as pool:
            results = pool.map(_tensorize_chunk, chunks)
        all_batches = [b for r in results for b in r]
    else:
        all_batches = _tensorize_chunk((batches, vocab, avocab, pad))

    os.makedirs(out_dir, exist_ok=True)
    n_shards = 0
    for i in range(0, len(all_batches), batches_per_shard):
        with open(os.path.join(out_dir, f'tensors-{n_shards}.pkl'), 'wb') as f:
            pickle.dump(all_batches[i:i + batches_per_shard], f,
                        pickle.HIGHEST_PROTOCOL)
        n_shards += 1
    return len(all_batches)

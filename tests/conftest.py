"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY.md §4)."""

import os

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import csv  # noqa: E402

import pytest  # noqa: E402

REFERENCE_DATA = '/root/reference/data'

# the 14 molecules from the reference's inline smoke test
# (/root/reference/ggpm/mol_graph.py:287-293)
GOLDEN_SMILES = [
    'CCC(NC(=O)c1scnc1C1CC1)C(=O)N1CCOCC1',
    'O=C1OCCC1Sc1nnc(-c2c[nH]c3ccccc23)n1C1CC1',
    'CCN(C)S(=O)(=O)N1CCC(Nc2cccc(OC)c2)CC1',
    'CC(=O)Nc1cccc(NC(C)c2ccccn2)c1',
    'Cc1cc(-c2nc3sc(C4CC4)nn3c2C#N)ccc1Cl',
    'CCOCCCNC(=O)c1cc(OC)ccc1Br',
    'Cc1nc(-c2ccncc2)[nH]c(=O)c1CC(=O)NC1CCCC1',
    'C#CCN(CC#C)C(=O)c1cc2ccccc2cc1OC(F)F',
    'CCOc1ccc(CN2c3ccccc3NCC2C)cc1N',
    'NC(=O)C1CCC(CNc2cc(-c3ccccc3)nc3ccnn23)CC1',
    'CC1CCc2noc(NC(=O)c3cc(=O)c4ccccc4o3)c2C1',
    'c1cc(-n2cnnc2)cc(-n2cnc3ccccc32)c1',
    'Cc1ccc(-n2nc(C)cc2NC(=O)C2CC3C=CC2C3)nn1',
    'O=c1ccc(c[nH]1)C1NCCc2ccc3OCCOc3c12',
]


@pytest.fixture(scope='session')
def golden_smiles():
    return GOLDEN_SMILES


@pytest.fixture(scope='session')
def small_train_data():
    rows = list(csv.DictReader(open(f'{REFERENCE_DATA}/chem_data/train.csv')))
    return [[r['SMILES'].strip(), float(r['HOMO']), float(r['LUMO'])]
            for r in rows][:24]


@pytest.fixture(scope='session')
def golden_vocab(golden_smiles):
    """PairVocab built over the golden molecules (labels + anchor pairs)."""
    from ggpm_tpu.graph.mol_graph import MolGraph
    from ggpm_tpu.graph.vocab import PairVocab
    MolGraph.FRAGMENTS = set()
    labels = set()
    for s in GOLDEN_SMILES:
        h = MolGraph(s)
        for _, d in h.mol_tree.nodes(data=True):
            labels.add(d['label'])
            for _, anc in d['inter_label']:
                labels.add((d['smiles'], anc))
    return PairVocab(sorted(labels))


@pytest.fixture(scope='session')
def tiny_model_setup(small_train_data):
    """A small trained PropertyVAE + vocab over the 24-molecule set."""
    from ggpm_tpu.data.batching import pad_batch
    from ggpm_tpu.data.vocab_extract import build_vocab
    from ggpm_tpu.graph.mol_graph import tensorize
    from ggpm_tpu.graph.vocab import PairVocab, common_atom_vocab
    from ggpm_tpu.models.vae import ModelConfig, PropertyVAE
    from ggpm_tpu.train.loop import Trainer
    from ggpm_tpu.train.optim import make_optimizer

    data = small_train_data
    vocab_rows, _ = build_vocab([r[0] for r in data], min_frequency=5)
    vocab = PairVocab([(x, y) for x, y, _ in vocab_rows])
    mbs = [pad_batch(tensorize(data[i:i + 8], vocab, common_atom_vocab))
           for i in range(0, len(data), 8)]
    cfg = ModelConfig(hvocab_size=vocab.size()[0], ivocab_size=vocab.size()[1],
                      hidden_size=64, embed_size=64, latent_size=24,
                      depthT=3, diterT=1)
    model = PropertyVAE(cfg=cfg)
    opt = make_optimizer(lr=2e-3, anneal_rate=0.98, steps_per_epoch=3)
    trainer = Trainer(model, opt, vocab.mask, beta=0.01, print_iter=10**9)
    params, opt_state = trainer.init(mbs[0])
    # enough steps that greedy reconstruction reliably recovers ≥1 training
    # molecule regardless of the PRNG stream (the key is threaded through
    # the jitted step, so stream changes are expected across refactors)
    for _ in range(20):
        params, opt_state, _ = trainer.train_epoch(params, opt_state, mbs)
    return dict(model=model, params=params, vocab=vocab, batches=mbs,
                trainer=trainer, cfg=cfg)

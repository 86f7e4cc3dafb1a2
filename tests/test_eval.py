"""Evaluation metrics, result post-processing, QM9, ChemBERTa tests."""

import numpy as np
import pytest

from ggpm_tpu.eval.metrics import Metrics, mol_weight, sa_proxy, wasserstein1
from ggpm_tpu.chem import get_mol


REF = ['c1ccccc1', 'Cc1ccccc1', 'c1ccsc1', 'CCO', 'CC(=O)Nc1ccccc1']
GEN = ['c1ccccc1', 'Cc1ccccc1', 'c1ccncc1', None, 'CCCO']


def test_validity_uniqueness():
    m = Metrics()
    assert m.validity(GEN) == pytest.approx(0.8)
    assert m.uniqueness(GEN) == 1.0
    assert m.uniqueness(['c1ccccc1', 'C1=CC=CC=C1']) == 0.5  # same molecule


def test_diversity_snn_frag():
    m = Metrics()
    d = m.internal_diversity(REF)
    assert 0.0 < d < 1.0
    snn = m.snn(GEN, REF)
    assert 0.0 < snn <= 1.0
    frag = m.frag_similarity(REF, REF)
    assert frag == pytest.approx(1.0)


def test_mw_and_sa():
    benzene = get_mol('c1ccccc1')
    assert mol_weight(benzene) == pytest.approx(78.11, abs=0.1)
    assert sa_proxy(get_mol('C1CCC2(CC1)CCCC2')) > sa_proxy(get_mol('CCCC'))
    assert wasserstein1([1, 2, 3], [1, 2, 3]) == pytest.approx(0.0, abs=1e-9)
    assert wasserstein1([0.0], [5.0]) == pytest.approx(5.0)


def test_full_suite_runs():
    out = Metrics().get_recon_n_sample_metrics(GEN, REF)
    for k in ('validity', 'diversity', 'SNN', 'Frag', 'MW', 'SA'):
        assert k in out
    assert out['FCD'] is None


def test_optimization_metrics():
    m = Metrics()
    res = m.get_optimization_metrics(
        gen=(['CCO', 'CCC'], ['CCO', 'CCCC']),
        org_props=([0.1, 0.2], [0.3, 0.4]),
        new_props=([-5.0, -5.1], [1.0, 1.1]),
        targets=([-5.0, -5.0], [1.0, 1.0]))
    assert res['DTT-MAE-HOMO'] == pytest.approx(0.05)
    assert 0.0 <= res['MW-Indicator'] <= 1.0


def test_vocab_stats(tmp_path):
    from ggpm_tpu.eval.results import vocab_stats
    p = tmp_path / 'vocab.txt'
    p.write_text('C C False\nCCO CCO True\nc1ccccc1 c1ccccc1 True\n'
                 'c1ccccc1 [cH:1]1ccccc1 True\n')
    stats = vocab_stats(str(p))
    assert stats['num_motifs'] == 3
    assert stats['mean_motif_size'] > 1


def test_validity_report():
    from ggpm_tpu.eval.results import validity_report
    rep = validity_report(['c1ccccc1', None, 'xxx'])
    assert rep['invalid'] == 2
    assert rep['validity'] == pytest.approx(1 / 3)


def test_qm9_featurizer():
    from ggpm_tpu.data.qm9 import featurize_qm9
    f = featurize_qm9('C#N')
    assert f['x'].shape[0] == 2
    assert f['edge_index'].shape == (2, 2)
    assert f['edge_attr'][0].argmax() == 2  # triple bond one-hot


def test_qm9_xyz_parse(tmp_path):
    from ggpm_tpu.data.qm9 import read_and_extract
    # scalar line: id, A, B, C, mu, alpha, then homo (idx 6) / lumo (idx 7)
    xyz = ('3\ngdb 1\tA\tB\tC\tmu\talpha\t-0.25\t0.08\tX\n'
           'O\t0\t0\t0\t0\nH\t0\t0\t0\t0\nH\t0\t0\t0\t0\n'
           'freq\nCCO\tCCO\nInChI\n')
    p = tmp_path / 'mol1.xyz'
    p.write_text(xyz)
    rows = read_and_extract(['mol1.xyz'], str(tmp_path))
    assert rows == [['CCO', -0.25, 0.08]]


def test_chemberta_tokenizer_and_forward():
    import jax
    import jax.numpy as jnp
    from ggpm_tpu.models.chemberta import ChemBertaForPR2, SmilesTokenizer
    tok = SmilesTokenizer.build(['c1ccccc1', 'CC(=O)N', '[nH]1cccc1'])
    toks = tok.encode_batch(['c1ccccc1', 'CC(=O)N'], max_len=32)
    assert toks.shape == (2, 32)
    model = ChemBertaForPR2(vocab_size=tok.vocab_size, hidden=32, heads=2,
                            layers=1, mlp_dim=64, max_len=32)
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng}, jnp.asarray(toks),
                        jnp.zeros(2), jnp.zeros(2), True)
    loss, metrics = model.apply(params, jnp.asarray(toks), jnp.zeros(2),
                                jnp.zeros(2), True)
    assert np.isfinite(float(loss))
    assert set(metrics) == {'homo_mae', 'homo_mse', 'lumo_mae', 'lumo_mse'}


def test_scheduled_model(tiny_model_setup):
    import jax
    import jax.numpy as jnp
    from ggpm_tpu.data.batching import to_model_batch
    from ggpm_tpu.models.vae import OPVNet
    st = tiny_model_setup
    batch = jax.tree.map(jnp.asarray, to_model_batch(
        st['batches'][0], st['vocab'].mask, pad=False))
    model = OPVNet.get_model('prop-opt-sched')(cfg=st['cfg'])
    rng = jax.random.PRNGKey(0)
    params = model.init({'params': rng, 'dropout': rng}, batch, 0.1, rng,
                        True, True, 0.5)
    loss, metrics, _ = model.apply(params, batch, 0.1, rng, True, True, 0.5)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply(p, batch, 0.1, rng, True, True, 0.5)[0])(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_fp_frechet():
    m = Metrics()
    same = m.fp_frechet(REF, REF)
    diff = m.fp_frechet(['CCCCCCCC', 'CCCCC', 'CCCC', 'CCCCCC'], REF)
    assert same < 1e-6
    assert diff > same

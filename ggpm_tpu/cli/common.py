"""Shared CLI plumbing: config → vocab → model → params."""

from __future__ import annotations

import csv
import os
from typing import List

import jax

from ..configs import Configs
from ..data.vocab_extract import load_vocab_file
from ..models.vae import ModelConfig, OPVNet
from ..train import checkpoint as ckpt


def read_csv_data(path: str) -> List[list]:
    """Read (SMILES, HOMO, LUMO) rows; drops rows with missing SMILES
    (reference preprocess.py:45-50)."""
    out = []
    with open(path) as f:
        for row in csv.DictReader(f):
            s = (row.get('SMILES') or '').strip()
            if not s:
                continue
            def num(key):
                v = (row.get(key) or '').strip()
                try:
                    return float(v)
                except ValueError:
                    return None
            out.append([s, num('HOMO'), num('LUMO')])
    return out


def setup_model(configs: Configs, model_type: str):
    """Load vocab, build the model class, return (model, vocab, mcfg)."""
    vocab, _ = load_vocab_file(configs.vocab_)
    mcfg = ModelConfig.from_configs(configs, vocab)
    model_cls = OPVNet.get_model(model_type)
    return model_cls(cfg=mcfg), vocab, mcfg


def init_params(model, sample_batch, seed: int = 1):
    rng = jax.random.PRNGKey(seed)
    return model.init({'params': rng, 'dropout': rng}, sample_batch, 0.1,
                      rng, True, False)


def maybe_load_pretrained(params, configs: Configs, model, vocab,
                          sample_batch):
    """Reproduce the reference's pretrain→fine-tune weight transfer
    (vae_train.py:40-53): load a saved PropertyVAE checkpoint and copy
    matching encoder(/decoder/property) weights."""
    saved = getattr(configs, 'saved_model', None)
    if not saved or not os.path.exists(saved):
        return params, False
    source_model = OPVNet.get_model('prop')(cfg=ModelConfig.from_configs(configs, vocab))
    src_params = init_params(source_model, sample_batch)
    src_params = ckpt.load_params(src_params, saved)
    if getattr(configs, 'load_encoder_only', False):
        params, n = ckpt.copy_encoder(params, src_params)
        print(f'Successfully copied encoder weights ({n} tensors).')
    else:
        params, n = ckpt.copy_matching(params, src_params,
                                       prefix_map={'params/vae/': 'params/'})
        print(f'Successfully copied encoder-decoder weights ({n} tensors).')
    return params, True

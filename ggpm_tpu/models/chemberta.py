"""ChemBERTa-style SMILES-transformer property-regression baseline.

Reference: /root/reference/chemberta_pr2_fine_tune.py — a RoBERTa backbone
(``seyonec/PubChem10M_SMILES_BPE_450k``) with an MLP head regressing
HOMO/LUMO, trained on MAE loss with early stopping.

TPU-native rebuild with flax.  The pretrained HuggingFace checkpoint is not
available offline, so the backbone initializes from scratch with the same
architecture family (configurable size) and a character/atom-level SMILES
tokenizer built from the training data; pass ``pretrained_dir`` to load a
local FlaxRoberta checkpoint when one is available.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_TOKEN_RE = re.compile(
    r'(\[[^\]]*\]|Br|Cl|Si|Se|se|si|@@|@|%\d{2}|[A-Za-z0-9=#:+\-()/\\.*$])')

PAD, BOS, EOS, UNK = 0, 1, 2, 3


class SmilesTokenizer:
    """Atom-level SMILES tokenizer (role of the reference's BPE tokenizer)."""

    def __init__(self, vocab: Optional[Dict[str, int]] = None):
        self.vocab = vocab or {}

    @classmethod
    def build(cls, smiles_list: Sequence[str]) -> 'SmilesTokenizer':
        toks = {}
        for s in smiles_list:
            for t in _TOKEN_RE.findall(s.strip()):
                toks[t] = toks.get(t, 0) + 1
        vocab = {t: i + 4 for i, t in enumerate(sorted(toks))}
        return cls(vocab)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab) + 4

    def encode(self, smiles: str, max_len: int = 256) -> np.ndarray:
        ids = [BOS] + [self.vocab.get(t, UNK)
                       for t in _TOKEN_RE.findall(smiles.strip())] + [EOS]
        ids = ids[:max_len]
        out = np.full(max_len, PAD, dtype=np.int32)
        out[:len(ids)] = ids
        return out

    def encode_batch(self, smiles_list: Sequence[str], max_len: int = 256):
        return np.stack([self.encode(s, max_len) for s in smiles_list])


class TransformerEncoderLayer(nn.Module):
    hidden: int
    heads: int
    mlp_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        a = nn.LayerNorm()(x)
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dropout_rate=self.dropout)(
            a, a, mask=mask, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(a, deterministic=deterministic)
        m = nn.LayerNorm()(x)
        m = nn.Dense(self.mlp_dim)(m)
        m = nn.gelu(m)
        m = nn.Dense(self.hidden)(m)
        x = x + nn.Dropout(self.dropout)(m, deterministic=deterministic)
        return x


class ChemBertaForPR2(nn.Module):
    """SMILES transformer + two-output regression head (reference
    ``ChemBertaForPR2``, chemberta_pr2_fine_tune.py:27-68)."""
    vocab_size: int
    hidden: int = 384
    heads: int = 6
    layers: int = 6
    mlp_dim: int = 1536
    max_len: int = 256
    head_hidden: Tuple[int, ...] = (256,)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tokens, homo_labels=None, lumo_labels=None,
                 deterministic=True):
        mask_1d = tokens != PAD
        attn_mask = mask_1d[:, None, None, :]
        pos = jnp.arange(tokens.shape[1])[None]
        x = nn.Embed(self.vocab_size, self.hidden)(tokens) + \
            nn.Embed(self.max_len, self.hidden)(pos)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for _ in range(self.layers):
            x = TransformerEncoderLayer(
                hidden=self.hidden, heads=self.heads, mlp_dim=self.mlp_dim,
                dropout=self.dropout)(x, attn_mask, deterministic)
        x = nn.LayerNorm()(x)
        # pooled output: BOS position through a tanh dense (RoBERTa pooler)
        pooled = jnp.tanh(nn.Dense(self.hidden)(x[:, 0]))

        h = pooled
        for hs in self.head_hidden:
            h = nn.relu(nn.Dense(hs)(h))
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = nn.Dense(2)(h)

        if homo_labels is None:
            return out
        homo_mae = jnp.abs(out[:, 0] - homo_labels).mean()
        lumo_mae = jnp.abs(out[:, 1] - lumo_labels).mean()
        homo_mse = ((out[:, 0] - homo_labels) ** 2).mean()
        lumo_mse = ((out[:, 1] - lumo_labels) ** 2).mean()
        loss = homo_mae + lumo_mae
        return loss, {'homo_mae': homo_mae, 'homo_mse': homo_mse,
                      'lumo_mae': lumo_mae, 'lumo_mse': lumo_mse}


def train_chemberta(train_data: List[list], val_data: List[list],
                    epochs: int = 10, batch_size: int = 16, lr: float = 1e-4,
                    anneal_rate: float = 0.9, patience: int = 5,
                    max_len: int = 256, seed: int = 0,
                    model_kwargs: Optional[dict] = None, log=print):
    """Fine-tuning loop (reference chemberta_pr2_fine_tune.py:91-193):
    Adam + exponential decay, per-epoch validation, early stopping on val
    loss."""
    import optax
    from ..train.checkpoint import EarlyStopping

    tok = SmilesTokenizer.build([r[0] for r in train_data])
    model = ChemBertaForPR2(vocab_size=tok.vocab_size, max_len=max_len,
                            **(model_kwargs or {}))
    rng = jax.random.PRNGKey(seed)

    def batches(data):
        out = []
        for i in range(0, len(data) - batch_size + 1, batch_size):
            chunk = data[i:i + batch_size]
            toks = tok.encode_batch([r[0] for r in chunk], max_len)
            homos = np.array([r[1] for r in chunk], dtype=np.float32)
            lumos = np.array([r[2] for r in chunk], dtype=np.float32)
            out.append((toks, homos, lumos))
        return out

    train_b, val_b = batches(train_data), batches(val_data)
    params = model.init({'params': rng, 'dropout': rng},
                        jnp.asarray(train_b[0][0]),
                        jnp.asarray(train_b[0][1]),
                        jnp.asarray(train_b[0][2]), False)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adam(optax.exponential_decay(
                          lr, max(len(train_b), 1), anneal_rate)))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, toks, homos, lumos, rng):
        def loss_fn(p):
            loss, m = model.apply(p, toks, homos, lumos, False,
                                  rngs={'dropout': rng})
            return loss, m
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, b: a + b, params, updates)
        return params, opt_state, metrics

    @jax.jit
    def eval_step(params, toks, homos, lumos):
        return model.apply(params, toks, homos, lumos, True)

    early = EarlyStopping(patience=patience, path='chemberta.best')
    for epoch in range(epochs):
        for toks, homos, lumos in train_b:
            rng, r = jax.random.split(rng)
            params, opt_state, metrics = step(
                params, opt_state, jnp.asarray(toks), jnp.asarray(homos),
                jnp.asarray(lumos), r)
        if val_b:
            vals = [eval_step(params, jnp.asarray(t), jnp.asarray(h),
                              jnp.asarray(l)) for t, h, l in val_b]
            vl = float(np.mean([float(v[0]) for v in vals]))
            vm = {k: float(np.mean([float(v[1][k]) for v in vals]))
                  for k in vals[0][1]}
            log(f'[epoch {epoch}] val loss {vl:.4f} ' +
                ' '.join(f'{k}={v:.4f}' for k, v in vm.items()))
            early(vl, params)
            if early.early_stop:
                log('Early stopping.')
                break
    return model, params, tok

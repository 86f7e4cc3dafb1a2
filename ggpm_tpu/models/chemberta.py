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

import os
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


def save_chemberta(path_prefix: str, params, tok: SmilesTokenizer) -> None:
    """Persist a trained ChemBERTa (params pickle + tokenizer vocab json)."""
    import json
    import pickle

    with open(path_prefix + '.params.pkl', 'wb') as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)
    with open(path_prefix + '.tokenizer.json', 'w') as f:
        json.dump(tok.vocab, f)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def load_pretrained_backbone(params, pretrained_dir: str, log=print):
    """Load backbone weights from a local checkpoint directory into ``params``
    (shape-filtered, the reference ``copy_model`` transfer semantics,
    nnutils.py:13-62).

    Two formats are recognised:

    * this framework's own ``save_chemberta`` output
      (``chemberta.params.pkl``): leaves are copied where path and shape
      match;
    * a HuggingFace **Flax** RoBERTa checkpoint (``flax_model.msgpack``,
      e.g. a locally downloaded ``seyonec/PubChem10M_SMILES_BPE_450k``):
      encoder-layer weights (attention q/k/v/out, FFN, LayerNorms) and
      position embeddings are mapped onto the corresponding modules.  Word
      embeddings are **not** transferred — the reference uses the HF BPE
      tokenizer while this rebuild uses an atom-level tokenizer, so token
      ids are incompatible (documented offline-reproducibility gap; see
      README).

    Returns the merged params and the number of transferred leaves.
    """
    import os
    import pickle

    native = os.path.join(pretrained_dir, 'chemberta.params.pkl')
    hf = os.path.join(pretrained_dir, 'flax_model.msgpack')
    flat_tgt = _flatten(params)
    n = 0
    if os.path.exists(native):
        with open(native, 'rb') as f:
            src = pickle.load(f)
        flat_src = _flatten(src)
        merged = {}
        for k, v in flat_tgt.items():
            s = flat_src.get(k)
            if s is not None and np.shape(s) == np.shape(v):
                merged[k] = jnp.asarray(s)
                n += 1
            else:
                merged[k] = v
        log(f'loaded {n}/{len(flat_tgt)} leaves from native checkpoint')
    elif os.path.exists(hf):
        from flax.serialization import msgpack_restore
        with open(hf, 'rb') as f:
            src = msgpack_restore(f.read())
        root = src.get('roberta', src)
        flat_src = _flatten(root)
        # map HF FlaxRoberta names onto our module names per encoder layer
        def hf_to_ours(path):
            p = '/'.join(path)
            out = []
            if 'encoder/layer/' in p:
                parts = path[path.index('layer') + 1:]
                li = parts[0]
                rest = '/'.join(parts[1:])
                base = ('params', f'TransformerEncoderLayer_{li}')
                m = {
                    'attention/self/query/kernel': ('MultiHeadDotProductAttention_0', 'query', 'kernel'),
                    'attention/self/query/bias': ('MultiHeadDotProductAttention_0', 'query', 'bias'),
                    'attention/self/key/kernel': ('MultiHeadDotProductAttention_0', 'key', 'kernel'),
                    'attention/self/key/bias': ('MultiHeadDotProductAttention_0', 'key', 'bias'),
                    'attention/self/value/kernel': ('MultiHeadDotProductAttention_0', 'value', 'kernel'),
                    'attention/self/value/bias': ('MultiHeadDotProductAttention_0', 'value', 'bias'),
                    'attention/output/dense/kernel': ('MultiHeadDotProductAttention_0', 'out', 'kernel'),
                    'attention/output/dense/bias': ('MultiHeadDotProductAttention_0', 'out', 'bias'),
                    'attention/output/LayerNorm/scale': ('LayerNorm_0', 'scale'),
                    'attention/output/LayerNorm/bias': ('LayerNorm_0', 'bias'),
                    'intermediate/dense/kernel': ('Dense_0', 'kernel'),
                    'intermediate/dense/bias': ('Dense_0', 'bias'),
                    'output/dense/kernel': ('Dense_1', 'kernel'),
                    'output/dense/bias': ('Dense_1', 'bias'),
                    'output/LayerNorm/scale': ('LayerNorm_1', 'scale'),
                    'output/LayerNorm/bias': ('LayerNorm_1', 'bias'),
                }
                if rest in m:
                    out.append(base + m[rest])
            elif p == 'embeddings/position_embeddings/embedding':
                out.append(('params', 'Embed_1', 'embedding'))
            return out

        merged = dict(flat_tgt)
        heads = None
        for spath, sval in flat_src.items():
            for tpath in hf_to_ours(spath):
                tval = merged.get(tpath)
                if tval is None:
                    continue
                sarr = np.asarray(sval)
                tshape = np.shape(tval)
                # HF stores attention kernels as [H, H]; flax MHA expects
                # [H, heads, head_dim] (and [heads, head_dim, H] for out)
                if sarr.shape != tshape and sarr.size == int(np.prod(tshape)):
                    sarr = sarr.reshape(tshape)
                if sarr.shape == tshape:
                    merged[tpath] = jnp.asarray(sarr)
                    n += 1
        log(f'loaded {n}/{len(flat_tgt)} leaves from HF flax checkpoint '
            '(word embeddings intentionally not transferred)')
    else:
        log(f'no recognised checkpoint in {pretrained_dir}; '
            'training from scratch')
        return params, 0

    def unflatten(flat):
        tree: dict = {}
        for path, v in flat.items():
            cur = tree
            for k in path[:-1]:
                cur = cur.setdefault(k, {})
            cur[path[-1]] = v
        return tree

    return unflatten(merged), n


def train_chemberta(train_data: List[list], val_data: List[list],
                    epochs: int = 10, batch_size: int = 16, lr: float = 1e-4,
                    anneal_rate: float = 0.9, patience: int = 5,
                    max_len: int = 256, seed: int = 0,
                    model_kwargs: Optional[dict] = None,
                    pretrained_dir: Optional[str] = None,
                    ckpt_path: str = 'runs/chemberta.best', log=print):
    """Fine-tuning loop (reference chemberta_pr2_fine_tune.py:91-193):
    Adam + exponential decay, per-epoch validation, early stopping on val
    loss.  Returns the BEST-val-loss params (restored from ``ckpt_path``),
    matching the reference's load-best-before-test protocol."""
    import optax
    from ..train.checkpoint import EarlyStopping, load_params

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
    if pretrained_dir:
        params, _ = load_pretrained_backbone(params, pretrained_dir, log)
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

    early = EarlyStopping(patience=patience, path=ckpt_path)
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
    if val_b and os.path.exists(early.path):
        params = load_params(params, early.path)
    return model, params, tok

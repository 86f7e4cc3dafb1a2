"""Graph encoders (motif-level and 3-level hierarchical) as flax modules.

TPU-first redesign of /root/reference/ggpm/encoder.py:8-157,252-341: all
message passing runs over padded index tensors with the index-0-padding
convention; the depth loop is unrolled for XLA pipelining; the root readout is
a gather over per-molecule scope starts.

Embedding sharing ("tie_embedding", reference encoder.py:92-94,297-299) is
realised by constructing the shared ``nn.Embed`` modules in the parent VAE and
passing them in, instead of post-hoc attribute aliasing.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..graph.mol_graph import MAX_POS
from ..ops import gather_nd, nei_sum
from .rnn import make_cell


class MPNEncoder(nn.Module):
    """One message-passing level (reference encoder.py:8-38).  ``dtype``
    selects the compute precision of the depth loop (bf16 halves state HBM
    traffic); the node readout is returned in f32."""
    rnn_type: str
    hidden_size: int
    depth: int
    dropout: float = 0.0
    dtype: Optional[Any] = None
    remat: bool = False   # checkpoint each depth iteration (rnn._unrolled)

    def setup(self):
        self.W_o = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        self.rnn = make_cell(self.rnn_type, self.hidden_size, self.depth,
                             dtype=self.dtype, remat=self.remat)

    def __call__(self, hnode, hmess, agraph, bgraph, deterministic=True,
                 bt=None):
        if self.dtype is not None:
            hmess = hmess.astype(self.dtype)
        state = self.rnn(hmess, bgraph, bt)
        h = self.rnn.hidden(state)
        nei_message = nei_sum(h, agraph)
        node_hiddens = jnp.concatenate(
            [hnode.astype(nei_message.dtype), nei_message], axis=-1)
        node_hiddens = self.drop(nn.relu(self.W_o(node_hiddens)),
                                 deterministic=deterministic)
        node_hiddens = node_hiddens.at[0].set(0.0)  # padding node
        return (node_hiddens.astype(jnp.float32),
                h.astype(jnp.float32))


def _bt(level: Dict[str, Any]):
    """Optional host-precomputed bgraph transpose (see ops.build_transpose);
    batches from ``level_to_dict`` carry it, hand-built dicts may not."""
    t = level.get('bgraph_t')
    return None if t is None else (t, level['bgraph_tm'])


def pos_onehot(idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.eye(MAX_POS, dtype=jnp.float32)[jnp.clip(idx, 0, MAX_POS - 1)]


class MotifEncoder(nn.Module):
    """Motif-level-only encoder — the thesis "MotifG2G" (reference
    encoder.py:252-341).  ``E_c``/``E_i`` may be passed in for embedding tying
    with the decoder."""
    hvocab_size: int
    ivocab_size: int
    atom_vocab_size: int
    rnn_type: str = 'LSTM'
    embed_size: int = 250
    hidden_size: int = 250
    depthT: int = 20
    dropout: float = 0.0
    compute_dtype: Optional[Any] = None
    remat: bool = False
    E_c: Optional[nn.Module] = None
    E_i: Optional[nn.Module] = None

    def setup(self):
        if self.E_c is None:
            self.E_c_mod = nn.Embed(self.hvocab_size, self.embed_size)
        if self.E_i is None:
            self.E_i_mod = nn.Embed(self.ivocab_size, self.embed_size)
        self.drop = nn.Dropout(self.dropout)
        self.W_root = nn.Dense(self.hidden_size)
        self.tree_encoder = MPNEncoder(rnn_type=self.rnn_type,
                                       hidden_size=self.hidden_size,
                                       depth=self.depthT,
                                       dropout=self.dropout,
                                       dtype=self.compute_dtype,
                                       remat=self.remat)

    def _ec(self):
        return self.E_c if self.E_c is not None else self.E_c_mod

    def _ei(self):
        return self.E_i if self.E_i is not None else self.E_i_mod

    def embed_tree(self, tree: Dict[str, Any], deterministic=True):
        fnode, fmess = tree['fnode'], tree['fmess']
        hnode = self.drop(self._ec()(fnode[:, 0]), deterministic=deterministic)
        hmess_nodes = self.drop(self._ei()(fnode[:, 1]), deterministic=deterministic)
        hmess = jnp.concatenate(
            [gather_nd(hmess_nodes, fmess[:, 0]), pos_onehot(fmess[:, 2])], axis=-1)
        return hnode, hmess

    def __call__(self, tree: Dict[str, Any], deterministic=True):
        hnode_in, hmess_in = self.embed_tree(tree, deterministic)
        node, mess = self.tree_encoder(hnode_in, hmess_in, tree['agraph'],
                                       tree['bgraph'], deterministic,
                                       bt=_bt(tree))
        # root readout (reference encoder.py:317-328)
        roots = tree['scope'][:, 0]
        froot = gather_nd(hnode_in, roots)
        nei = nei_sum(mess, gather_nd(tree['agraph'], roots))
        root = jnp.tanh(self.W_root(jnp.concatenate([froot, nei], axis=-1)))
        return root, node


class HierMPNEncoder(nn.Module):
    """Three-level atom → attachment → motif encoder (reference
    encoder.py:41-157)."""
    hvocab_size: int
    ivocab_size: int
    atom_vocab_size: int
    rnn_type: str = 'LSTM'
    embed_size: int = 250
    hidden_size: int = 250
    depthT: int = 20
    depthG: int = 20
    dropout: float = 0.0
    compute_dtype: Optional[Any] = None
    remat: bool = False
    E_c: Optional[nn.Module] = None
    E_i: Optional[nn.Module] = None

    def setup(self):
        if self.E_c is None:
            self.E_c_mod = nn.Embed(self.hvocab_size, self.embed_size)
        if self.E_i is None:
            self.E_i_mod = nn.Embed(self.ivocab_size, self.embed_size)
        self.drop = nn.Dropout(self.dropout)
        self.W_c = nn.Dense(self.hidden_size)
        self.W_i = nn.Dense(self.hidden_size)
        self.W_root = nn.Dense(self.hidden_size)
        self.tree_encoder = MPNEncoder(rnn_type=self.rnn_type,
                                       hidden_size=self.hidden_size,
                                       depth=self.depthT, dropout=self.dropout,
                                       dtype=self.compute_dtype,
                                       remat=self.remat)
        self.inter_encoder = MPNEncoder(rnn_type=self.rnn_type,
                                        hidden_size=self.hidden_size,
                                        depth=self.depthT, dropout=self.dropout,
                                        dtype=self.compute_dtype,
                                        remat=self.remat)
        self.graph_encoder = MPNEncoder(rnn_type=self.rnn_type,
                                        hidden_size=self.hidden_size,
                                        depth=self.depthG, dropout=self.dropout,
                                        dtype=self.compute_dtype,
                                        remat=self.remat)

    def _ec(self):
        return self.E_c if self.E_c is not None else self.E_c_mod

    def _ei(self):
        return self.E_i if self.E_i is not None else self.E_i_mod

    def embed_graph(self, graph):
        """Atom layer features (reference encoder.py:119-126)."""
        fnode, fmess = graph['fnode'], graph['fmess']
        hnode = jnp.eye(self.atom_vocab_size, dtype=jnp.float32)[fnode]
        fmess1 = gather_nd(hnode, fmess[:, 0])
        fmess2 = jnp.eye(4, dtype=jnp.float32)[jnp.clip(fmess[:, 2], 0, 3)]
        fpos = pos_onehot(fmess[:, 3])
        hmess = jnp.concatenate([fmess1, fmess2, fpos], axis=-1)
        return hnode, hmess

    def __call__(self, tree, graph, deterministic=True):
        # atom layer
        hnode_g, hmess_g = self.embed_graph(graph)
        hatom, _ = self.graph_encoder(hnode_g, hmess_g, graph['agraph'],
                                      graph['bgraph'], deterministic,
                                      bt=_bt(graph))
        fnode, fmess = tree['fnode'], tree['fmess']
        # attachment layer (reference embed_inter, encoder.py:96-107)
        finput = self.drop(self._ei()(fnode[:, 1]), deterministic=deterministic)
        hclu = nei_sum(hatom, tree['cgraph'])
        hnode_i = self.drop(
            nn.relu(self.W_i(jnp.concatenate([finput, hclu], axis=-1))),
            deterministic=deterministic)
        hmess_i = jnp.concatenate(
            [gather_nd(hnode_i, fmess[:, 0]), pos_onehot(fmess[:, 2])], axis=-1)
        hinter, _ = self.inter_encoder(hnode_i, hmess_i, tree['agraph'],
                                       tree['bgraph'], deterministic,
                                       bt=_bt(tree))
        # motif layer (reference embed_tree, encoder.py:109-117)
        cinput = self.drop(self._ec()(fnode[:, 0]), deterministic=deterministic)
        hnode_t = self.drop(
            nn.relu(self.W_c(jnp.concatenate([cinput, hinter], axis=-1))),
            deterministic=deterministic)
        hmess_t = jnp.concatenate(
            [gather_nd(hnode_t, fmess[:, 0]), pos_onehot(fmess[:, 2])], axis=-1)
        hnode, hmess = self.tree_encoder(hnode_t, hmess_t, tree['agraph'],
                                         tree['bgraph'], deterministic,
                                         bt=_bt(tree))
        # root readout over the motif layer (reference encoder.py:128-138)
        roots = tree['scope'][:, 0]
        froot = gather_nd(hnode_t, roots)
        nei = nei_sum(hmess, gather_nd(tree['agraph'], roots))
        hroot = jnp.tanh(self.W_root(jnp.concatenate([froot, nei], axis=-1)))
        return hroot, hnode, hinter, hatom

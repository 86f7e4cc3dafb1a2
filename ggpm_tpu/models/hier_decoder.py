"""Hierarchical (3-level) autoregressive decoder — teacher-forced training.

TPU-first redesign of the reference ``HierMPNDecoder.forward``
(/root/reference/ggpm/decoder.py:166-284).  Same scan architecture as the
motif decoder (see ``ggpm_tpu.models.decoder``), extended with the atom-level
incremental message passing: the scan carry holds message state for all three
levels plus persistent atom/attachment node-hidden buffers, and each step

1. runs ``diterG`` graph-cell rounds on the atom-graph edges unmasked at the
   previous step (the newly attached cluster) and refreshes those atoms'
   hidden vectors;
2. embeds the frontier attachment node from the refreshed atom hiddens and
   runs ``diterT`` inter-cell rounds on the step's tree message;
3. embeds the frontier motif node from the refreshed attachment hiddens and
   runs ``diterT`` tree-cell rounds, producing topology / motif prediction
   vectors;
4. scores assembly candidates against the *current* atom hiddens
   (``enum_attach``, reference decoder.py:286-301 — unlike the motif decoder
   this is candidate-dependent), emitting per-event cross-entropy terms.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.mol_graph import MAX_POS
from ..ops import gather_nd, nei_sum
from .decoder import PredictionMLP, attend, scope_mask
from .encoder import pos_onehot
from .rnn import make_cell


class HierDecoder(nn.Module):
    hvocab_size: int
    ivocab_size: int
    atom_vocab_size: int
    rnn_type: str = 'LSTM'
    embed_size: int = 250
    hidden_size: int = 250
    latent_size: int = 24
    diterT: int = 1
    diterG: int = 3
    dropout: float = 0.0
    remat: bool = False      # rematerialise the scan step (memory ↓, FLOPs ↑)
    use_attention: bool = False
    E_c: Optional[nn.Module] = None
    E_i: Optional[nn.Module] = None

    def setup(self):
        if self.E_c is None:
            self.E_c_mod = nn.Embed(self.hvocab_size, self.embed_size)
        if self.E_i is None:
            self.E_i_mod = nn.Embed(self.ivocab_size, self.embed_size)
        self.drop = nn.Dropout(self.dropout)
        h = self.hidden_size
        # three incremental levels (IncHierMPNEncoder, encoder.py:182-249)
        self.tree_rnn = make_cell(self.rnn_type, h, self.diterT)
        self.inter_rnn = make_cell(self.rnn_type, h, self.diterT)
        self.graph_rnn = make_cell(self.rnn_type, h, self.diterG)
        self.W_tree_node = nn.Dense(h)    # tree IncMPNEncoder.W_o
        self.W_inter_node = nn.Dense(h)   # inter IncMPNEncoder.W_o
        self.W_graph_node = nn.Dense(h)   # graph IncMPNEncoder.W_o
        self.W_c = nn.Dense(h)            # motif embed
        self.W_i = nn.Dense(h)            # attachment embed
        # prediction heads (reference decoder.py:35-57)
        self.topoNN = PredictionMLP(hidden_size=h, out_size=1, dropout=self.dropout)
        self.clsNN = PredictionMLP(hidden_size=h, out_size=self.hvocab_size,
                                   dropout=self.dropout)
        self.iclsNN = PredictionMLP(hidden_size=h, out_size=self.ivocab_size,
                                    dropout=self.dropout)
        self.matchNN = nn.Dense(h)        # input hidden + embed + MAX_POS
        self.W_assm = nn.Dense(self.latent_size)
        if self.latent_size != self.hidden_size:
            self.W_root = nn.Dense(self.hidden_size)
        if self.use_attention:
            # attention context heads (reference decoder.py:62-65); topo/cls
            # attend over the motif-level source memory, assm over the
            # atom-level one (src_tree_vecs / src_graph_vecs split,
            # decoder.py:136-164)
            self.A_topo = nn.Dense(self.latent_size)
            self.A_cls = nn.Dense(self.latent_size)
            self.A_assm = nn.Dense(self.latent_size)

    def _ec(self):
        return self.E_c if self.E_c is not None else self.E_c_mod

    def _ei(self):
        return self.E_i if self.E_i is not None else self.E_i_mod

    def root_vecs_to_hidden(self, root_vecs):
        if self.latent_size != self.hidden_size:
            return self.W_root(root_vecs)
        return root_vecs

    def _graph_inputs(self, graph):
        """Static atom-level message inputs (embed_graph, encoder.py:119-126)."""
        fnode, fmess = graph['fnode'], graph['fmess']
        hnode = jnp.eye(self.atom_vocab_size, dtype=jnp.float32)[fnode]
        hmess = jnp.concatenate([
            gather_nd(hnode, fmess[:, 0]),
            jnp.eye(4, dtype=jnp.float32)[jnp.clip(fmess[:, 2], 0, 3)],
            pos_onehot(fmess[:, 3])], axis=-1)
        return hnode, hmess

    def __call__(self, tree: Dict[str, Any], graph: Dict[str, Any],
                 plan: Dict[str, Any], root_vecs: jnp.ndarray,
                 vocab_mask: jnp.ndarray, deterministic: bool = True,
                 src_tree_mem=None, src_graph_mem=None):
        fnode, fmess = tree['fnode'], tree['fmess']
        agraph_dec, bgraph_dec = tree['agraph_dec'], tree['bgraph_dec']
        agraph, bgraph = tree['agraph'], tree['bgraph']
        cgraph = tree['cgraph']
        g_agraph, g_bgraph = graph['agraph'], graph['bgraph']
        num_mess = fmess.shape[0]
        num_gmess = graph['fmess'].shape[0]
        num_gnodes = graph['fnode'].shape[0]
        num_tnodes = fnode.shape[0]
        batch_size = root_vecs.shape[0]
        H = self.hidden_size

        att = self.use_attention and src_tree_mem is not None
        if att:
            tmask = scope_mask(tree['scope'], src_tree_mem.shape[0])
            gmask = scope_mask(graph['scope'], src_graph_mem.shape[0])

        init_vecs = self.root_vecs_to_hidden(root_vecs)
        ec_emb = self.drop(self._ec()(fnode[:, 0]), deterministic=deterministic)
        ei_emb = self.drop(self._ei()(fnode[:, 1]), deterministic=deterministic)
        g_hnode, g_hmess_in = self._graph_inputs(graph)
        pos_tab = pos_onehot(fmess[:, 2])

        tree_state = self.tree_rnn.init_state(num_mess, init_vecs)
        # vzero ties the zero-initialised carries to the (possibly
        # device-varying) latent so the scan carry type is stable under
        # shard_map (unvarying-in / varying-out carries are rejected)
        vzero = root_vecs[0, 0] * 0.0
        inter_state = tuple(s + vzero for s in self.inter_rnn.init_state(num_mess))
        graph_state = tuple(s + vzero for s in self.graph_rnn.init_state(num_gmess))
        hatom = jnp.zeros((num_gnodes, H)) + vzero
        hinter_node = jnp.zeros((num_tnodes, H)) + vzero

        if self.is_initializing():
            nei_t = tuple(jnp.zeros((1, bgraph_dec.shape[1], H)) for _ in tree_state)
            nei_g = tuple(jnp.zeros((1, g_bgraph.shape[1], H)) for _ in graph_state)
            self.tree_rnn.cell(jnp.zeros((1, H + MAX_POS)), nei_t)
            self.inter_rnn.cell(jnp.zeros((1, H + MAX_POS)), nei_t)
            self.graph_rnn.cell(g_hmess_in[:1], nei_g)
            self.W_graph_node(jnp.zeros((1, self.atom_vocab_size + H)))
            self.W_inter_node(jnp.zeros((1, 2 * H)))
            self.W_tree_node(jnp.zeros((1, 2 * H)))
            self.W_i(jnp.zeros((1, self.embed_size + H)))
            self.W_c(jnp.zeros((1, self.embed_size + H)))
            self.matchNN(jnp.zeros((1, H + self.embed_size + MAX_POS)))
            self.W_assm(jnp.zeros((1, H)))
            if self.use_attention:
                # A_assm is applied inside the scan step; params must exist
                # before the scan is traced
                self.A_assm(jnp.zeros((1, H)))

        def sparse_update(rnn, state, rows, x, bg, n_iter):
            valid = (rows > 0)
            for _ in range(n_iter):
                # compose the index first (gather [rows, nb, H], not the
                # whole [M, nb, H] table) — see MotifDecoder._run_scan
                nei = tuple(gather_nd(s, bg[rows]) for s in state)
                new = rnn.cell(x, nei)
                state = tuple(
                    s.at[rows].set(jnp.where(valid[..., None], nr, s[rows]))
                    .at[0].set(0.0)
                    for s, nr in zip(state, new))
            return state

        def step(carry, inputs):
            (tree_state, inter_state, graph_state, hatom, hinter_node) = carry
            (rows, x_nodes, g_rows, g_nodes, cands, cand_ok, icls_ids,
             n_icls, nth) = inputs

            # --- 1. atom level: process previous step's cluster -----------
            gr = g_rows.reshape(-1)
            graph_state = sparse_update(
                self.graph_rnn, graph_state, gr, g_hmess_in[gr], g_bgraph,
                self.diterG)
            gh = self.graph_rnn.hidden(graph_state)
            gn = g_nodes.reshape(-1)
            g_node_h = nn.relu(self.W_graph_node(jnp.concatenate(
                [g_hnode[gn], nei_sum(gh, g_agraph[gn])], axis=-1)))
            hatom = hatom.at[gn].set(
                jnp.where((gn > 0)[:, None], g_node_h, hatom[gn])).at[0].set(0.0)

            # --- 2. attachment (inter) level ------------------------------
            src = fmess[rows, 0]
            hclu = nei_sum(hatom, cgraph[src])
            inter_embed_src = nn.relu(self.W_i(jnp.concatenate(
                [ei_emb[src], hclu], axis=-1)))
            x_i = jnp.concatenate([inter_embed_src, pos_tab[rows]], axis=-1)
            inter_state = sparse_update(self.inter_rnn, inter_state, rows,
                                        x_i, bgraph, self.diterT)
            ih = self.inter_rnn.hidden(inter_state)
            hclu_x = nei_sum(hatom, cgraph[x_nodes])
            inter_embed_x = nn.relu(self.W_i(jnp.concatenate(
                [ei_emb[x_nodes], hclu_x], axis=-1)))
            inter_node_h = nn.relu(self.W_inter_node(jnp.concatenate(
                [inter_embed_x, nei_sum(ih, agraph[x_nodes])], axis=-1)))
            hinter_node = hinter_node.at[x_nodes].set(
                jnp.where((x_nodes > 0)[:, None], inter_node_h,
                          hinter_node[x_nodes])).at[0].set(0.0)

            # --- 3. motif (tree) level ------------------------------------
            tree_embed_src = nn.relu(self.W_c(jnp.concatenate(
                [ec_emb[src], hinter_node[src]], axis=-1)))
            x_t = jnp.concatenate([tree_embed_src, pos_tab[rows]], axis=-1)
            tree_state = sparse_update(self.tree_rnn, tree_state, rows, x_t,
                                       bgraph_dec, self.diterT)
            th = self.tree_rnn.hidden(tree_state)
            tree_embed_x = nn.relu(self.W_c(jnp.concatenate(
                [ec_emb[x_nodes], hinter_node[x_nodes]], axis=-1)))
            topo_vec = nn.relu(self.W_tree_node(jnp.concatenate(
                [tree_embed_x, nei_sum(th, agraph_dec[x_nodes])], axis=-1)))
            cls_vec = th[rows]

            # --- 4. assembly candidate vectors ----------------------------
            # cand atoms [B, C, 2] → matchNN([hatom, E_i(icls), pos]) summed
            # over the anchor pair (reference enum_attach, decoder.py:286-301)
            cand_h = hatom[cands]                          # [B, C, 2, H]
            icls_e = self.drop(self._ei()(icls_ids),
                               deterministic=True)         # [B, 2, E]
            icls_e = jnp.broadcast_to(icls_e[:, None], cand_h.shape[:3] + (self.embed_size,))
            pos_e = pos_onehot(nth)[:, None, None, :]
            pos_e = jnp.broadcast_to(pos_e, cand_h.shape[:3] + (MAX_POS,))
            mvec = nn.relu(self.matchNN(jnp.concatenate(
                [cand_h, icls_e, pos_e], axis=-1)))        # [B, C, 2, H]
            k_mask = (jnp.arange(2)[None, None, :] < n_icls[:, None, None])
            cand_vecs = (mvec * k_mask[..., None]).sum(axis=2)   # [B, C, H]
            cand_vecs = cand_vecs * cand_ok[..., None]
            if att:
                # per-candidate attention over atom-level source memory
                # (get_assm_score with use_attention, decoder.py:159-164)
                proj = self.A_assm(cand_vecs)                # [B, C, latent]
                sc = jnp.einsum('nl,bcl->bcn', src_graph_mem, proj)
                sc = jnp.where(gmask[:, None, :], sc,
                               jnp.finfo(sc.dtype).min / 4)
                assm_ctx = jnp.einsum('bcn,nl->bcl',
                                      jax.nn.softmax(sc, -1), src_graph_mem)
            else:
                assm_ctx = root_vecs[:, None, :]
            cand_scores = (self.W_assm(cand_vecs) * assm_ctx).sum(-1)  # [B, C]

            carry = (tree_state, inter_state, graph_state, hatom, hinter_node)
            return carry, (topo_vec, cls_vec, cand_scores)

        carry = (tree_state, inter_state, graph_state, hatom, hinter_node)
        xs = (plan['mess'], plan['xid'], plan['gstep_mess'],
              plan['gstep_nodes'], plan['assm_cands'], plan['assm_cand_ok'],
              plan['assm_icls'], plan['assm_n_icls'], plan['assm_nth'])
        step_fn = jax.checkpoint(step) if self.remat else step
        _, (topo_vecs, cls_vecs, cand_scores) = jax.lax.scan(step_fn, carry, xs)

        # ---- losses (identical head structure to the motif decoder) ------
        T = topo_vecs.shape[0]
        active = plan['active']
        latent_b = jnp.broadcast_to(root_vecs[None],
                                    (T, batch_size, self.latent_size))

        if att:
            topo_ctx = attend(src_tree_mem, tmask, topo_vecs, self.A_topo)
            root_cls_ctx = attend(src_tree_mem, tmask, init_vecs, self.A_cls)
            step_cls_ctx = attend(src_tree_mem, tmask, cls_vecs, self.A_cls)
        else:
            topo_ctx = latent_b
            root_cls_ctx = root_vecs
            step_cls_ctx = latent_b

        topo_logits = self.topoNN(
            jnp.concatenate([topo_vecs, topo_ctx], axis=-1),
            deterministic)[..., 0]
        tlab = plan['tlab'].astype(jnp.float32)
        topo_bce = jnp.maximum(topo_logits, 0) - topo_logits * tlab + \
            jnp.log1p(jnp.exp(-jnp.abs(topo_logits)))
        act_f = active.astype(jnp.float32)
        topo_loss = (topo_bce * act_f).sum()
        topo_acc = (((topo_logits >= 0).astype(jnp.int32) == plan['tlab'])
                    * active).sum() / jnp.maximum(active.sum(), 1)

        def heads(vec, ctx):
            x = jnp.concatenate([vec, ctx], axis=-1)
            return self.clsNN(x, deterministic), self.iclsNN(x, deterministic)

        root_cls_logits, root_icls_logits = heads(init_vecs, root_cls_ctx)
        step_cls_logits, step_icls_logits = heads(cls_vecs, step_cls_ctx)
        root_icls_logits = root_icls_logits + vocab_mask[plan['root_clab']]
        step_icls_logits = step_icls_logits + vocab_mask[plan['clab']]

        def ce(logits, labels):
            logz = jax.nn.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
            return logz - gold

        has_cls = plan['has_cls'].astype(jnp.float32)
        cls_loss = ce(root_cls_logits, plan['root_clab']).sum() + \
            (ce(step_cls_logits, plan['clab']) * has_cls).sum()
        icls_loss = ce(root_icls_logits, plan['root_ilab']).sum() + \
            (ce(step_icls_logits, plan['ilab']) * has_cls).sum()
        n_cls = batch_size + has_cls.sum()
        cls_acc = ((jnp.argmax(root_cls_logits, -1) == plan['root_clab']).sum()
                   + ((jnp.argmax(step_cls_logits, -1) == plan['clab'])
                      * plan['has_cls']).sum()) / n_cls
        icls_acc = ((jnp.argmax(root_icls_logits, -1) == plan['root_ilab']).sum()
                    + ((jnp.argmax(step_icls_logits, -1) == plan['ilab'])
                       * plan['has_cls']).sum()) / n_cls

        # assembly CE over [real candidate slots] + [zero-vector pad slots]
        bias = self.W_assm(jnp.zeros((self.hidden_size,)))
        if att:
            pad_ctx = attend(src_graph_mem, gmask,
                             jnp.zeros((batch_size, self.hidden_size)),
                             self.A_assm)
            p_score = (bias * pad_ctx).sum(-1)[None, :]        # [1, B]
        else:
            p_score = (bias * root_vecs).sum(-1)[None, :]      # [1, B]
        nc = plan['assm_nc'].astype(jnp.float32)
        maxc = plan['max_cls_size'].astype(jnp.float32)
        neg = jnp.finfo(jnp.float32).min / 4
        masked = jnp.where(plan['assm_cand_ok'], cand_scores, neg)
        m = jnp.maximum(jnp.max(masked, axis=-1), p_score)
        real_sum = (jnp.exp(masked - m[..., None]) *
                    plan['assm_cand_ok']).sum(-1)
        lse = jnp.log(real_sum + jnp.maximum(maxc - nc, 0.0)
                      * jnp.exp(p_score - m) + 1e-12) + m
        gold = cand_scores[..., 0]
        has_assm = plan['has_assm'].astype(jnp.float32)
        assm_loss = ((lse - gold) * has_assm).sum()
        best = jnp.max(jnp.where(plan['assm_cand_ok'], cand_scores, neg), -1)
        best = jnp.maximum(best, jnp.where(nc >= maxc, neg, p_score))
        assm_correct = gold >= best
        assm_acc = jnp.where(
            has_assm.sum() > 0,
            (assm_correct * plan['has_assm']).sum() /
            jnp.maximum(plan['has_assm'].sum(), 1), 1.0)

        loss = (topo_loss + cls_loss + icls_loss + assm_loss) / batch_size
        return loss, {'Word': cls_acc, 'I-Word': icls_acc, 'Topo': topo_acc,
                      'Assm': assm_acc}

    # -- autoregressive decode step functions ------------------------------
    # Mirrors the two IncHierMPNEncoder calls per reference decode step
    # (decoder.py:367-399) with graph bookkeeping host-side; all index tables
    # are passed per call as fixed-width arrays.

    def _sparse_direct(self, rnn, state, rows, x, bg_rows, n_iter):
        """Cell application on explicit rows with explicit predecessor-row
        tables (decode-time variant of the scan's sparse update)."""
        valid = (rows > 0)
        for _ in range(n_iter):
            nei = tuple(s[bg_rows] for s in state)
            new = rnn.cell(x, nei)
            state = tuple(
                s.at[rows].set(jnp.where(valid[..., None], nr, s[rows]))
                .at[0].set(0.0)
                for s, nr in zip(state, new))
        return state

    def hdec_init(self, n_tree_rows: int, n_graph_rows: int, n_gnodes: int,
                  n_tnodes: int, root_vecs):
        init = self.root_vecs_to_hidden(root_vecs)
        b = init.shape[0]
        tree_state = self.tree_rnn.init_state(n_tree_rows)
        tree_state = (tree_state[0].at[1:b + 1].set(init),) + tuple(tree_state[1:])
        inter_state = self.inter_rnn.init_state(n_tree_rows)
        graph_state = self.graph_rnn.init_state(n_graph_rows)
        hatom = jnp.zeros((n_gnodes, self.hidden_size))
        hinter_node = jnp.zeros((n_tnodes, self.hidden_size))
        return (tree_state, inter_state, graph_state, hatom, hinter_node)

    def _g_mess_input(self, src_av, bt, nth):
        return jnp.concatenate([
            jnp.eye(self.atom_vocab_size, dtype=jnp.float32)[src_av],
            jnp.eye(4, dtype=jnp.float32)[jnp.clip(bt, 0, 3)],
            pos_onehot(nth)], axis=-1)

    def hdec_graph_update(self, state, g_rows, g_src_av, g_bt, g_nth,
                          g_bg_rows, g_nodes, g_node_av, g_ag_rows):
        """Atom-level refresh of the frontier clusters (reference decode
        subgraph pass)."""
        tree_s, inter_s, graph_s, hatom, hinter_node = state
        flat = g_rows.reshape(-1)
        x = self._g_mess_input(g_src_av.reshape(-1), g_bt.reshape(-1),
                               g_nth.reshape(-1))
        graph_s = self._sparse_direct(self.graph_rnn, graph_s, flat, x,
                                      g_bg_rows.reshape(-1, g_bg_rows.shape[-1]),
                                      self.diterG)
        gh = self.graph_rnn.hidden(graph_s)
        gn = g_nodes.reshape(-1)
        hn = jnp.eye(self.atom_vocab_size, dtype=jnp.float32)[g_node_av.reshape(-1)]
        node_h = nn.relu(self.W_graph_node(jnp.concatenate(
            [hn, gh[g_ag_rows.reshape(-1, g_ag_rows.shape[-1])].sum(axis=-2)],
            axis=-1)))
        hatom = hatom.at[gn].set(
            jnp.where((gn > 0)[:, None], node_h, hatom[gn])).at[0].set(0.0)
        return (tree_s, inter_s, graph_s, hatom, hinter_node)

    def hdec_topo(self, state, v_nodes, v_clab, v_ilab, v_cgraph, v_ag_rows,
                  root_vecs):
        """Frontier 3-level node readout + topology logits; also refreshes
        the attachment-node buffer used by subsequent message embedding."""
        tree_s, inter_s, graph_s, hatom, hinter_node = state
        hclu = hatom[v_cgraph].sum(axis=-2)
        inter_emb = nn.relu(self.W_i(jnp.concatenate(
            [self._ei()(v_ilab), hclu], axis=-1)))
        ih = self.inter_rnn.hidden(inter_s)
        inter_node = nn.relu(self.W_inter_node(jnp.concatenate(
            [inter_emb, ih[v_ag_rows].sum(axis=-2)], axis=-1)))
        hinter_node = hinter_node.at[v_nodes].set(
            jnp.where((v_nodes > 0)[:, None], inter_node,
                      hinter_node[v_nodes])).at[0].set(0.0)
        tree_emb = nn.relu(self.W_c(jnp.concatenate(
            [self._ec()(v_clab), inter_node], axis=-1)))
        th = self.tree_rnn.hidden(tree_s)
        tree_node = nn.relu(self.W_tree_node(jnp.concatenate(
            [tree_emb, th[v_ag_rows].sum(axis=-2)], axis=-1)))
        logits = self.topoNN(jnp.concatenate([tree_node, root_vecs], axis=-1),
                             True)[..., 0]
        state = (tree_s, inter_s, graph_s, hatom, hinter_node)
        return state, logits

    def hdec_mess_update(self, state, rows, src_nodes, src_clab, src_ilab,
                         src_cgraph, pos, inter_bg_rows, tree_bg_rows):
        """Compute inter- and tree-level messages for this step's new edges."""
        tree_s, inter_s, graph_s, hatom, hinter_node = state
        hclu = hatom[src_cgraph].sum(axis=-2)
        inter_emb = nn.relu(self.W_i(jnp.concatenate(
            [self._ei()(src_ilab), hclu], axis=-1)))
        x_i = jnp.concatenate([inter_emb, pos_onehot(pos)], axis=-1)
        inter_s = self._sparse_direct(self.inter_rnn, inter_s, rows, x_i,
                                      inter_bg_rows, self.diterT)
        tree_emb = nn.relu(self.W_c(jnp.concatenate(
            [self._ec()(src_clab), hinter_node[src_nodes]], axis=-1)))
        x_t = jnp.concatenate([tree_emb, pos_onehot(pos)], axis=-1)
        tree_s = self._sparse_direct(self.tree_rnn, tree_s, rows, x_t,
                                     tree_bg_rows, self.diterT)
        return (tree_s, inter_s, graph_s, hatom, hinter_node)

    def hdec_cls(self, state, rows, root_vecs):
        th = self.tree_rnn.hidden(state[0])
        x = jnp.concatenate([th[rows], root_vecs], axis=-1)
        return self.clsNN(x, True), self.iclsNN(x, True)

    # fused variants: one device call per decode half-step (the hier decode
    # is roundtrip-latency-bound; see decode.HierDecodeKernel)
    def hdec_graph_topo(self, state, g_rows, g_src_av, g_bt, g_nth,
                        g_bg_rows, g_nodes, g_node_av, g_ag_rows,
                        v_nodes, v_clab, v_ilab, v_cgraph, v_ag_rows,
                        root_vecs):
        state = self.hdec_graph_update(state, g_rows, g_src_av, g_bt, g_nth,
                                       g_bg_rows, g_nodes, g_node_av,
                                       g_ag_rows)
        return self.hdec_topo(state, v_nodes, v_clab, v_ilab, v_cgraph,
                              v_ag_rows, root_vecs)

    def hdec_mess_cls_topk(self, state, rows, src_nodes, src_clab, src_ilab,
                           src_cgraph, pos, inter_bg_rows, tree_bg_rows,
                           root_vecs, vocab_mask, beam: int):
        from .decode import hier_topk
        state = self.hdec_mess_update(state, rows, src_nodes, src_clab,
                                      src_ilab, src_cgraph, pos,
                                      inter_bg_rows, tree_bg_rows)
        cls_scores, icls_scores = self.hdec_cls(state, rows, root_vecs)
        scores, cls_k, icls_k = hier_topk(cls_scores, icls_scores,
                                          vocab_mask, beam)
        return state, scores, cls_k, icls_k

    def hdec_step_fused(self, state, g_rows, g_src_av, g_bt, g_nth,
                        g_bg_rows, g_nodes, g_node_av, g_ag_rows,
                        v_nodes, v_clab, v_ilab, v_cgraph, v_ag_rows,
                        can_expand, u, new_rows, exp_bg_rows,
                        bt_valid, bt_pos, bt_bg_rows,
                        root_vecs, vocab_mask, beam: int):
        """ONE device call per hier decode step: atom-level refresh of the
        previous step's cluster + frontier topology + speculative message
        update + motif top-k (see MotifDecoder.dec_step_fused for the
        branch-selection rationale; in the hier tree both branches share the
        frontier as message source, only position and predecessor rows
        differ)."""
        from .decode import hier_topk
        state = self.hdec_graph_update(state, g_rows, g_src_av, g_bt, g_nth,
                                       g_bg_rows, g_nodes, g_node_av,
                                       g_ag_rows)
        state, topo_logits = self.hdec_topo(state, v_nodes, v_clab, v_ilab,
                                            v_cgraph, v_ag_rows, root_vecs)
        choose = (jax.nn.sigmoid(topo_logits) > u) & can_expand
        valid = choose | bt_valid
        rows = jnp.where(valid, new_rows, 0)
        pos = jnp.where(choose, 0, bt_pos)
        bg = jnp.where(choose[:, None], exp_bg_rows, bt_bg_rows)
        state = self.hdec_mess_update(state, rows, v_nodes, v_clab, v_ilab,
                                      v_cgraph, pos, bg, bg)
        cls_scores, icls_scores = self.hdec_cls(state, rows, root_vecs)
        scores, cls_k, icls_k = hier_topk(cls_scores, icls_scores,
                                          vocab_mask, beam)
        # pack host-bound outputs into ONE array — one tunnel RTT per step
        packed = jnp.concatenate(
            [topo_logits[:, None], choose.astype(jnp.float32)[:, None],
             scores, cls_k.astype(jnp.float32),
             icls_k.astype(jnp.float32)], axis=1)
        return state, packed

    def hdec_assm(self, state, cand_atoms, icls_ids, n_icls, nth, ctx):
        """Per-candidate assembly scores against current atom hiddens
        (reference enum_attach + get_assm_score in decode,
        decoder.py:436-443)."""
        hatom = state[3]
        cand_h = hatom[cand_atoms]                         # [C, 2, H]
        icls_e = self._ei()(icls_ids)                      # [2, E]
        icls_e = jnp.broadcast_to(icls_e[None], cand_h.shape[:2] + (self.embed_size,))
        pos_e = jnp.broadcast_to(pos_onehot(nth)[None, None],
                                 cand_h.shape[:2] + (MAX_POS,))
        mvec = nn.relu(self.matchNN(jnp.concatenate(
            [cand_h, icls_e, pos_e], axis=-1)))
        k_mask = (jnp.arange(2)[None, :] < n_icls)[..., None]
        cand_vecs = (mvec * k_mask).sum(axis=1)            # [C, H]
        return (self.W_assm(cand_vecs) * ctx[None]).sum(-1)

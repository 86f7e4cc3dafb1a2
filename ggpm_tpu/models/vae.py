"""VAE model variants and the model registry.

Reference: /root/reference/ggpm/property_vae.py (PropertyVAE, PropOptVAE,
HierPropertyVAE, HierPropOptVAE) and /root/reference/ggpm/opvnet.py.

All stochastic paths take explicit PRNG keys.  ``forward`` returns
``(loss, metrics, aux)`` where ``aux['clipped']`` reproduces the reference's
negative-loss circuit-breaker signal (property_vae.py:352-357).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .decoder import MotifDecoder
from .hier_decoder import HierDecoder
from .encoder import HierMPNEncoder, MotifEncoder
from .heads import LossWeigh, PropertyOptimizer


def _dtype(cfg):
    """Resolve the config's compute precision (encoder depth loop; losses
    and heads stay f32)."""
    name = getattr(cfg, 'compute_dtype', 'float32')
    return jnp.bfloat16 if name in ('bfloat16', 'bf16') else None


class ModelConfig:
    """Attribute bag mirroring the reference Configs fields the models read."""

    def __init__(self, hvocab_size: int, ivocab_size: int, atom_vocab_size: int = 38,
                 rnn_type: str = 'LSTM', embed_size: int = 250, hidden_size: int = 250,
                 latent_size: int = 24, linear_hidden_size: int = 128,
                 depthT: int = 20, depthG: int = 20, diterT: int = 1, diterG: int = 5,
                 dropout: float = 0.0, tie_embedding: bool = True,
                 loss_scaling: bool = False, remat: bool = False,
                 loop_remat: bool = False,
                 use_attention: bool = False,
                 compute_dtype: str = 'float32'):
        self.hvocab_size = hvocab_size
        self.ivocab_size = ivocab_size
        self.atom_vocab_size = atom_vocab_size
        self.rnn_type = rnn_type
        self.embed_size = embed_size
        self.hidden_size = hidden_size
        self.latent_size = latent_size
        self.linear_hidden_size = linear_hidden_size
        self.depthT = depthT
        self.depthG = depthG
        self.diterT = diterT
        self.diterG = diterG
        self.dropout = dropout
        self.tie_embedding = tie_embedding
        self.loss_scaling = loss_scaling
        self.remat = remat
        # Encoder depth-loop remat: measured a pure throughput loss in every
        # regime on TPU (runs/MFU.json vs /tmp/mfu_remat1_full.json, round 4:
        # canonical b240 2838→2293 mols/s, large b240 697→565) — the gates it
        # recomputes are gather-bound, not free.  Memory lever only.
        self.loop_remat = loop_remat
        self.use_attention = use_attention
        self.compute_dtype = compute_dtype

    @classmethod
    def from_configs(cls, configs, vocab):
        hv, iv = vocab.size()
        return cls(
            hvocab_size=hv, ivocab_size=iv,
            rnn_type=getattr(configs, 'rnn_type', 'LSTM'),
            embed_size=getattr(configs, 'embed_size', 250),
            hidden_size=getattr(configs, 'hidden_size', 250),
            latent_size=getattr(configs, 'latent_size', 24),
            linear_hidden_size=getattr(configs, 'linear_hidden_size', 128),
            depthT=getattr(configs, 'depthT', 20),
            depthG=getattr(configs, 'depthG', 20),
            diterT=getattr(configs, 'diterT', 1),
            diterG=getattr(configs, 'diterG', 5),
            dropout=getattr(configs, 'dropout', 0.0),
            tie_embedding=getattr(configs, 'tie_embedding', True),
            loss_scaling=getattr(configs, 'loss_scaling', False),
            remat=getattr(configs, 'remat', False),
            loop_remat=getattr(configs, 'loop_remat', False),
            use_attention=getattr(configs, 'use_attention', False),
            compute_dtype=getattr(configs, 'compute_dtype', 'float32'),
        )


class PropertyVAE(nn.Module):
    """Motif-level VAE without property heads (reference
    property_vae.py:64-127; registry name ``prop``)."""
    cfg: ModelConfig
    is_hier = False  # family marker (Trainer lane-packs motif-family plans)

    def setup(self):
        c = self.cfg
        if c.tie_embedding:
            self.E_c = nn.Embed(c.hvocab_size, c.embed_size)
            self.E_i = nn.Embed(c.ivocab_size, c.embed_size)
            ec, ei = self.E_c, self.E_i
        else:
            ec = ei = None
        self.decoder = MotifDecoder(
            hvocab_size=c.hvocab_size, ivocab_size=c.ivocab_size,
            atom_vocab_size=c.atom_vocab_size, rnn_type=c.rnn_type,
            embed_size=c.embed_size, hidden_size=c.hidden_size,
            latent_size=c.latent_size, diterT=c.diterT, dropout=c.dropout,
            remat=c.remat, use_attention=c.use_attention, E_c=ec, E_i=ei)
        self.encoder = MotifEncoder(
            hvocab_size=c.hvocab_size, ivocab_size=c.ivocab_size,
            atom_vocab_size=c.atom_vocab_size, rnn_type=c.rnn_type,
            embed_size=c.embed_size, hidden_size=c.hidden_size,
            depthT=c.depthT, dropout=c.dropout,
            compute_dtype=_dtype(c), remat=c.loop_remat, E_c=ec, E_i=ei)
        self.R_mean = nn.Dense(c.latent_size)
        self.R_var = nn.Dense(c.latent_size)
        if c.use_attention:
            # dedicated projection for the attention memory: reusing R_mean
            # would let attention gradients flow into the posterior-mean head
            # (ADVICE r2) — the reference keeps them separate by passing raw
            # source vecs (its attention path is unusable as written,
            # decoder.py:136-164; see PARITY.md)
            self.A_mem = nn.Dense(c.latent_size)

    def _decoder(self):
        return self.decoder

    # -- pieces ------------------------------------------------------------
    def rsample(self, z_vecs, rng: Optional[jax.Array], perturb: bool = True):
        """Reparameterised sampling with ``z_log_var = −|W_var z|``
        (reference property_vae.py:92-99)."""
        batch_size = z_vecs.shape[0]
        z_mean = self.R_mean(z_vecs)
        z_log_var = -jnp.abs(self.R_var(z_vecs))
        kl = -0.5 * jnp.sum(1.0 + z_log_var - z_mean * z_mean -
                            jnp.exp(z_log_var)) / batch_size
        if perturb:
            eps = jax.random.normal(rng, z_mean.shape)
            z = z_mean + jnp.exp(z_log_var / 2) * eps
        else:
            z = z_mean
        return z, kl

    def encode(self, tree, deterministic=True):
        root, node = self.encoder(tree, deterministic)
        return root, node

    def encode_latent(self, tree, rng=None, perturb=False, deterministic=True):
        root, _ = self.encoder(tree, deterministic)
        z, kl = self.rsample(root, rng, perturb)
        return z, kl

    def encode_attention_memory(self, tree, deterministic=True):
        """(src_mem, scope) for attention-aware reconstruction decoding:
        the encoder's node hiddens projected by ``A_mem`` (the same memory
        the training heads attend over) and the per-sample scope windows.
        Pass both to ``decode_motif(src_mem=..., src_scope=...)``."""
        _, node = self.encoder(tree, deterministic)
        return self.A_mem(node), tree['scope']

    def decoder_loss(self, tree, plan, root_vecs, vocab_mask, deterministic):
        return self.decoder(tree, plan, root_vecs, vocab_mask, deterministic)

    # -- training forward --------------------------------------------------
    def __call__(self, batch: Dict[str, Any], beta: float,
                 rng: Optional[jax.Array] = None, perturb_z: bool = True,
                 deterministic: bool = True):
        tree, plan = batch['tree'], batch['plan']
        root, node = self.encoder(tree, deterministic)
        z, kl = self.rsample(root, rng, perturb_z)
        # attention memory: encoder node hiddens projected into latent space
        # by a dedicated head (config flag ``use_attention``, reference
        # decoder.py:28,62-65,124-134)
        src_mem = self.A_mem(node) if self.cfg.use_attention else None
        loss, metrics = self.decoder(tree, plan, z, batch['vocab_mask'],
                                     deterministic, src_mem=src_mem)
        total = loss + beta * kl
        metrics = dict(metrics, Loss=total, KL=kl)
        return total, metrics, {'clipped': jnp.array(False)}


class PropOptVAE(nn.Module):
    """Motif VAE + HOMO/LUMO property heads on the split latent
    (reference property_vae.py:257-394; registry name ``prop-opt``)."""
    cfg: ModelConfig
    is_hier = False

    def setup(self):
        c = self.cfg
        self.vae = PropertyVAE(cfg=c)
        self.property_optim = PropertyOptimizer(
            hidden_size=c.linear_hidden_size, dropout=c.dropout)
        if c.loss_scaling:
            self.loss_weigh = LossWeigh()
        self.half_latent = c.latent_size // 2

    def _decoder(self):
        return self.vae.decoder

    def rsample(self, z_vecs, rng, perturb=True):
        return self.vae.rsample(z_vecs, rng, perturb)

    def encode_latent(self, tree, rng=None, perturb=False, deterministic=True):
        return self.vae.encode_latent(tree, rng, perturb, deterministic)

    def encode_attention_memory(self, tree, deterministic=True):
        return self.vae.encode_attention_memory(tree, deterministic)

    def predict_properties(self, z, deterministic=True):
        return self.property_optim.predict(
            z[:, :self.half_latent], z[:, self.half_latent:], deterministic)

    def property_loss(self, z, homos, lumos, deterministic=True):
        return self.property_optim(
            z[:, :self.half_latent], z[:, self.half_latent:], (homos, lumos),
            deterministic)

    def __call__(self, batch: Dict[str, Any], beta: float,
                 rng: Optional[jax.Array] = None, perturb_z: bool = True,
                 deterministic: bool = True):
        tree, plan = batch['tree'], batch['plan']
        rng_z, rng_clip = (jax.random.split(rng) if rng is not None
                           else (None, None))
        root, node = self.vae.encoder(tree, deterministic)
        z, kl = self.vae.rsample(root, rng_z, perturb_z)

        homo_loss, lumo_loss, _, _ = self.property_loss(
            z, batch['homos'], batch['lumos'], deterministic)
        src_mem = self.vae.A_mem(node) if self.cfg.use_attention else None
        recon_loss, metrics = self.vae.decoder(tree, plan, z,
                                               batch['vocab_mask'],
                                               deterministic, src_mem=src_mem)
        recon_loss = recon_loss + beta * kl

        if self.cfg.loss_scaling:
            recon_loss, homo_loss, lumo_loss = self.loss_weigh(
                recon_loss, homo_loss, lumo_loss)

        total = recon_loss + homo_loss + lumo_loss
        # negative-loss circuit breaker (reference property_vae.py:352-357):
        # replace a negative total with a N(0.5, 0.5) sample and flag it
        clipped = total <= 0
        if rng_clip is not None:
            noise = 0.5 + 0.5 * jax.random.normal(rng_clip, ())
        else:
            noise = jnp.array(0.5)
        total = jnp.where(clipped, noise, total)

        metrics = dict(metrics, Loss=total, KL=kl, Recs_Loss=recon_loss,
                       HOMO_MSE=homo_loss, LUMO_MSE=lumo_loss)
        return total, metrics, {'clipped': clipped}


class HierPropertyVAE(nn.Module):
    """Hierarchical (3-level) VAE (reference property_vae.py:11-62; registry
    name ``hier-prop``).  Encoder is fully hierarchical; the training decoder
    currently shares the motif-level scan path (atom-level teacher forcing is
    layered on in the hier decode plan)."""
    cfg: ModelConfig
    is_hier = True  # hier scan reads gstep_*/assm_cand* — plans stay unpacked

    def setup(self):
        c = self.cfg
        if c.tie_embedding:
            self.E_c = nn.Embed(c.hvocab_size, c.embed_size)
            self.E_i = nn.Embed(c.ivocab_size, c.embed_size)
            ec, ei = self.E_c, self.E_i
        else:
            ec = ei = None
        self.encoder = HierMPNEncoder(
            hvocab_size=c.hvocab_size, ivocab_size=c.ivocab_size,
            atom_vocab_size=c.atom_vocab_size, rnn_type=c.rnn_type,
            embed_size=c.embed_size, hidden_size=c.hidden_size,
            depthT=c.depthT, depthG=c.depthG, dropout=c.dropout,
            compute_dtype=_dtype(c), remat=c.loop_remat, E_c=ec, E_i=ei)
        self.decoder = HierDecoder(
            hvocab_size=c.hvocab_size, ivocab_size=c.ivocab_size,
            atom_vocab_size=c.atom_vocab_size, rnn_type=c.rnn_type,
            embed_size=c.embed_size, hidden_size=c.hidden_size,
            latent_size=c.latent_size, diterT=c.diterT, diterG=c.diterG,
            dropout=c.dropout, remat=c.remat,
            use_attention=c.use_attention, E_c=ec, E_i=ei)
        self.R_mean = nn.Dense(c.latent_size)
        self.R_var = nn.Dense(c.latent_size)
        if c.use_attention:
            # dedicated attention-memory projection (see PropertyVAE.setup)
            self.A_mem = nn.Dense(c.latent_size)

    def _decoder(self):
        return self.decoder

    def rsample(self, z_vecs, rng, perturb=True):
        batch_size = z_vecs.shape[0]
        z_mean = self.R_mean(z_vecs)
        z_log_var = -jnp.abs(self.R_var(z_vecs))
        kl = -0.5 * jnp.sum(1.0 + z_log_var - z_mean * z_mean -
                            jnp.exp(z_log_var)) / batch_size
        if perturb:
            eps = jax.random.normal(rng, z_mean.shape)
            z = z_mean + jnp.exp(z_log_var / 2) * eps
        else:
            z = z_mean
        return z, kl

    def encode_latent(self, batch_or_tree, rng=None, perturb=False,
                      deterministic=True, graph=None):
        tree = batch_or_tree
        root, _, _, _ = self.encoder(tree, graph, deterministic)
        return self.rsample(root, rng, perturb)

    def __call__(self, batch: Dict[str, Any], beta: float,
                 rng: Optional[jax.Array] = None, perturb_z: bool = True,
                 deterministic: bool = True):
        tree, graph, plan = batch['tree'], batch['graph'], batch['plan']
        root, hnode, _, hatom = self.encoder(tree, graph, deterministic)
        z, kl = self.rsample(root, rng, perturb_z)
        if self.cfg.use_attention:
            # motif-level memory for topo/cls, atom-level for assm
            # (src_tree_vecs / src_graph_vecs, reference decoder.py:136-164)
            src_tree_mem, src_graph_mem = self.A_mem(hnode), self.A_mem(hatom)
        else:
            src_tree_mem = src_graph_mem = None
        loss, metrics = self.decoder(tree, graph, plan, z,
                                     batch['vocab_mask'], deterministic,
                                     src_tree_mem=src_tree_mem,
                                     src_graph_mem=src_graph_mem)
        total = loss + beta * kl
        metrics = dict(metrics, Loss=total, KL=kl)
        return total, metrics, {'clipped': jnp.array(False)}


class HierPropOptVAE(nn.Module):
    """Hierarchical VAE + property heads (reference property_vae.py:130-254;
    registry name ``hier-prop-opt``).

    Reference quirk reproduced deliberately: the β·KL term is *dropped* from
    the hier fine-tune total (dead code at property_vae.py:232-241) — KL is
    reported in metrics but not added to the loss."""
    cfg: ModelConfig
    is_hier = True

    def setup(self):
        c = self.cfg
        self.hier = HierPropertyVAE(cfg=c)
        self.property_optim = PropertyOptimizer(
            hidden_size=c.linear_hidden_size, dropout=c.dropout)
        if c.loss_scaling:
            self.loss_weigh = LossWeigh()
        self.half_latent = c.latent_size // 2

    def _decoder(self):
        return self.hier.decoder

    def rsample(self, z_vecs, rng, perturb=True):
        return self.hier.rsample(z_vecs, rng, perturb)

    def encode_latent(self, tree, rng=None, perturb=False, deterministic=True,
                      graph=None):
        return self.hier.encode_latent(tree, rng, perturb, deterministic,
                                       graph=graph)

    def predict_properties(self, z, deterministic=True):
        return self.property_optim.predict(
            z[:, :self.half_latent], z[:, self.half_latent:], deterministic)

    def property_loss(self, z, homos, lumos, deterministic=True):
        return self.property_optim(
            z[:, :self.half_latent], z[:, self.half_latent:], (homos, lumos),
            deterministic)

    def __call__(self, batch: Dict[str, Any], beta: float,
                 rng: Optional[jax.Array] = None, perturb_z: bool = True,
                 deterministic: bool = True):
        tree, graph, plan = batch['tree'], batch['graph'], batch['plan']
        rng_z, rng_clip = (jax.random.split(rng) if rng is not None
                           else (None, None))
        root, hnode, _, hatom = self.hier.encoder(tree, graph, deterministic)
        z, kl = self.hier.rsample(root, rng_z, perturb_z)

        homo_loss, lumo_loss, _, _ = self.property_loss(
            z, batch['homos'], batch['lumos'], deterministic)
        if self.cfg.use_attention:
            src_tree_mem = self.hier.A_mem(hnode)
            src_graph_mem = self.hier.A_mem(hatom)
        else:
            src_tree_mem = src_graph_mem = None
        recon_loss, metrics = self.hier.decoder(
            tree, graph, plan, z, batch['vocab_mask'], deterministic,
            src_tree_mem=src_tree_mem, src_graph_mem=src_graph_mem)
        if self.cfg.loss_scaling:
            recon_loss, homo_loss, lumo_loss = self.loss_weigh(
                recon_loss, homo_loss, lumo_loss)
        total = recon_loss + homo_loss + lumo_loss  # note: no beta*kl (quirk)
        clipped = total <= 0
        if rng_clip is not None:
            noise = 0.5 + 0.5 * jax.random.normal(rng_clip, ())
        else:
            noise = jnp.array(0.5)
        total = jnp.where(clipped, noise, total)
        metrics = dict(metrics, Loss=total, KL=kl, Recs_Loss=recon_loss,
                       HOMO_MSE=homo_loss, LUMO_MSE=lumo_loss)
        return total, metrics, {'clipped': clipped}


class PropOptSchedulingVAE(nn.Module):
    """Motif VAE + property heads with a scheduled-sampling decoder
    (reference PropOptSchedulingVAE, property_vae.py:399-480; the property
    losses are weighted 20×, property_vae.py:477).  The reference's
    scheduling decoder implementation is broken — this is the repaired
    intent (see MotifDecoder.scheduled_forward)."""
    cfg: ModelConfig
    is_hier = False

    def setup(self):
        c = self.cfg
        self.vae = PropertyVAE(cfg=c)
        self.property_optim = PropertyOptimizer(
            hidden_size=c.linear_hidden_size, dropout=c.dropout)
        self.half_latent = c.latent_size // 2

    def _decoder(self):
        return self.vae.decoder

    def rsample(self, z_vecs, rng, perturb=True):
        return self.vae.rsample(z_vecs, rng, perturb)

    def encode_latent(self, tree, rng=None, perturb=False, deterministic=True):
        return self.vae.encode_latent(tree, rng, perturb, deterministic)

    def encode_attention_memory(self, tree, deterministic=True):
        return self.vae.encode_attention_memory(tree, deterministic)

    def predict_properties(self, z, deterministic=True):
        return self.property_optim.predict(
            z[:, :self.half_latent], z[:, self.half_latent:], deterministic)

    def __call__(self, batch: Dict[str, Any], beta: float,
                 rng: Optional[jax.Array] = None, perturb_z: bool = True,
                 deterministic: bool = True, tf_ratio: float = 1.0):
        tree, plan = batch['tree'], batch['plan']
        rng_z, rng_sched = (jax.random.split(rng) if rng is not None
                            else (jax.random.PRNGKey(0),) * 2)
        root, _ = self.vae.encoder(tree, deterministic)
        z, kl = self.vae.rsample(root, rng_z, perturb_z)
        homo_loss, lumo_loss, _, _ = self.property_optim(
            z[:, :self.half_latent], z[:, self.half_latent:],
            (batch['homos'], batch['lumos']), deterministic)
        recon_loss, metrics = self.vae.decoder.scheduled_forward(
            tree, plan, z, batch['vocab_mask'], tf_ratio, rng_sched,
            deterministic)
        recon_loss = recon_loss + beta * kl
        total = recon_loss + 20.0 * homo_loss + 20.0 * lumo_loss
        metrics = dict(metrics, Loss=total, KL=kl, Recs_Loss=recon_loss,
                       HOMO_MSE=homo_loss, LUMO_MSE=lumo_loss)
        return total, metrics, {'clipped': jnp.array(False)}


class OPVNet:
    """Model registry (reference /root/reference/ggpm/opvnet.py:3-13, plus
    the scheduled-sampling variant under ``prop-opt-sched``)."""
    MODEL_DICT = {
        'prop': PropertyVAE,
        'prop-opt': PropOptVAE,
        'hier-prop': HierPropertyVAE,
        'hier-prop-opt': HierPropOptVAE,
        'prop-opt-sched': PropOptSchedulingVAE,
    }

    @staticmethod
    def get_model(name: str):
        try:
            return OPVNet.MODEL_DICT[name]
        except KeyError:
            raise ValueError(f'Model {name} does not exist '
                             f'(have: {sorted(OPVNet.MODEL_DICT)})')


# Legacy alias: the original hgraph2graph-style HierVAE (reference
# /root/reference/ggpm/hpgnn.py:15-76) is architecturally the hierarchical
# property VAE without heads; prior sampling lives in
# ggpm_tpu.models.decode.sample_prior.
HierVAE = HierPropertyVAE

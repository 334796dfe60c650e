"""End-to-end inference pipelines.

Parity targets (reference models/sample_model.py):
  BaseSampleModel.sample_and_refine  :215-254   (per-sample python loop -> one
                                                 batched jitted decode here)
  BaseSampleModel.sample_fn          :256-328   (lax.scan decode loop)
  bot_index_prediction               :183-213
  SampleFromParsingModel             :343-360
  SampleFromPoseModel                :363-498   (parsing generation, texture
                                                 mask construction :443-467,
                                                 UI feed hooks :469-485)

The whole text->image path after data loading is three jitted calls:
tokenize (segm -> tokens), sample (256-step scan), decode (top entry lookup ->
index prediction -> hierarchical decode), each operating on the full batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from text2human_tpu.config import (
    FCNHeadConfig,
    QuantizerConfig,
    ShapeAttrConfig,
    TransformerConfig,
    UNetConfig,
    VQGANConfig,
)
from text2human_tpu.diffusion.absorbing import (
    AbsorbingDiffusion,
    sample_autoregressive,
    sample_loop,
    sample_maskgit,
)
from text2human_tpu.models.composites import (
    HierarchyVQ,
    IndexPredictionNet,
    ParsingGenerator,
    SegmVQVAE,
)
from text2human_tpu.models.transformer import (
    TransformerMultiHead,
    ragged_head_groups,
)
from text2human_tpu.ops.nn import nearest_downsample_mask

from text2human_tpu.constants import (
    ABSENT_ATTR,
    LOWER_CLASSES,
    OUTER_CLASSES,
    UPPER_CLASSES,
)


def texture_mask_from_segm(
    segm: jax.Array,
    upper_attr: jax.Array,
    lower_attr: jax.Array,
    outer_attr: jax.Array,
) -> jax.Array:
    """Build the per-pixel texture-codebook mask from a parsing map and the
    three fused texture attributes (reference sample_model.py:443-467 and
    data/segm_attr_dataset.py:140-151).

    mask 0 = shared codebook; attr+1 elsewhere; attr 17 = region absent.
    segm [N,H,W] int; attrs [N] int -> [N,H,W] float32.
    """
    segm = segm.astype(jnp.int32)
    mask = jnp.zeros_like(segm)

    def paint(mask, classes, attr):
        in_region = jnp.zeros_like(segm, dtype=bool)
        for c in classes:
            in_region |= segm == c
        active = (attr != ABSENT_ATTR)[:, None, None]
        value = (attr + 1)[:, None, None].astype(jnp.int32)
        return jnp.where(in_region & active, value, mask)

    mask = paint(mask, UPPER_CLASSES, upper_attr)
    mask = paint(mask, LOWER_CLASSES, lower_attr)
    mask = paint(mask, OUTER_CLASSES, outer_attr)
    return mask.astype(jnp.float32)


@dataclass
class PipelineConfigs:
    top: VQGANConfig
    top_quant: QuantizerConfig
    bot: VQGANConfig
    bot_quant: QuantizerConfig
    segm: VQGANConfig
    segm_quant: QuantizerConfig
    transformer: TransformerConfig
    index_unet: UNetConfig
    index_fcn: FCNHeadConfig
    shape_attr: Optional[ShapeAttrConfig] = None
    parsing_unet: Optional[UNetConfig] = None
    parsing_fcn: Optional[FCNHeadConfig] = None
    sample_steps: int = 256
    num_segm_classes: int = 24


def with_conv_dtype(cfgs: PipelineConfigs, dtype: str) -> PipelineConfigs:
    """Copy of ``cfgs`` with every conv stage's compute dtype replaced.

    Flips the activation dtype of the VQGAN encoder/decoder stacks (top, bot,
    segm) and the UNet/FCN stages (parsing generation, index prediction);
    params, normalization statistics and emitted logits stay float32.  Used by
    the fast serving preset (YAML key ``conv_dtype: bfloat16``) where the conv
    stages dominate once ``decode_mode: maskgit`` shrinks the sample stage —
    the default pipeline keeps float32 convs for reference parity
    (BENCHMARKS.md).
    """
    import dataclasses

    if dtype not in ("float32", "bfloat16"):
        raise ValueError(f"unsupported conv_dtype {dtype!r}")

    def flip(cfg):
        return None if cfg is None else dataclasses.replace(
            cfg, compute_dtype=dtype
        )

    return dataclasses.replace(
        cfgs,
        top=flip(cfgs.top),
        bot=flip(cfgs.bot),
        segm=flip(cfgs.segm),
        index_unet=flip(cfgs.index_unet),
        index_fcn=flip(cfgs.index_fcn),
        parsing_unet=flip(cfgs.parsing_unet),
        parsing_fcn=flip(cfgs.parsing_fcn),
    )


class SamplePipeline:
    """Composite inference model over the six checkpoints.

    params layout (mirrors the reference checkpoint dependency graph,
    SURVEY.md §5):
      params['hierarchy']    HierarchyVQ params (top quantize/post-quant +
                             shared decoder + bottom stack)
      params['segm']         SegmVQVAE params
      params['sampler']      TransformerMultiHead params
      params['index_pred']   {'params':…, 'batch_stats':…}
      params['parsing_gen']  {'params':…, 'batch_stats':…}  (pose path only)
    """

    def __init__(
        self,
        cfgs: PipelineConfigs,
        dtype=jnp.float32,
        fused_attn=None,
        ragged_heads: bool = True,
        mesh=None,
        dp_axis: str = "dp",
        decode_mode: str = "absorbing",
        kv_cache: bool = True,
    ):
        self.cfgs = cfgs
        # KV-cached incremental decode for the autoregressive sampler mode
        # (models/ar_decode.py); ignored by the diffusion modes
        self.kv_cache = kv_cache
        # 'absorbing' (reference random-order unmasking, the default) or
        # 'maskgit' (confidence-ordered multi-token unmasking — a documented
        # divergence that cuts trunk passes ~8x; diffusion/absorbing.py
        # sample_maskgit, YAML key `decode_mode`)
        if decode_mode not in ("absorbing", "maskgit"):
            raise ValueError(f"unknown decode_mode {decode_mode!r}")
        self.decode_mode = decode_mode
        # whole-sequence fused attention in the decode loop (ops/attn_pallas):
        # measured +58% throughput at batch 32, +5% at batch 4 on v5e
        # (BENCHMARKS.md). Auto: on for TPU backends, off elsewhere (the
        # interpret-mode fallback is for tests, far too slow for a 256-step
        # scan on CPU).
        if fused_attn is None:
            fused_attn = jax.default_backend() == "tpu"
        self.fused_attn = fused_attn
        # grouped-matmul head selection (models/transformer.py ragged_heads):
        # same math, 18x fewer head-stage FLOPs than the masked accumulation
        self.ragged_heads = ragged_heads
        # multi-chip serving: with a dp-only mesh, the denoiser trunk runs
        # under shard_map with the batch split on ``dp_axis`` — keeping the
        # ragged-head sort device-local and the scan state/randomness
        # global-shaped, so results are bit-identical to the single-device
        # path (batch must divide the dp axis size).  The Pallas kernel
        # itself no longer needs shard_map — it carries its own
        # custom_partitioning rule (see the tp paragraph below).
        #
        # With tp > 1 in the mesh, dp-only shard_map does not apply: the
        # serving layout is jit sharding propagation (shard the sampler
        # params with parallel.mesh.transformer_param_specs; XLA splits the
        # einsums per device — docs/SCALING.md).  The fused attention kernel
        # participates in that layout too: it carries a head-granular
        # `custom_partitioning` rule (ops/attn_pallas.py:_head_partition),
        # so GSPMD runs the same kernel per device on its local heads
        # instead of falling back to einsum attention.
        self.mesh = mesh
        self.dp_axis = dp_axis
        self._tp_serving = mesh is not None and any(
            name != dp_axis and dict(mesh.shape)[name] > 1
            for name in mesh.axis_names
        )
        self.hierarchy = HierarchyVQ(cfgs.top, cfgs.top_quant, cfgs.bot, cfgs.bot_quant)
        self.segm_vq = SegmVQVAE(cfgs.segm, cfgs.segm_quant)
        self.denoiser = TransformerMultiHead(cfgs.transformer, dtype=dtype)
        self.index_pred = IndexPredictionNet(cfgs.index_unet, cfgs.index_fcn)
        if cfgs.parsing_unet is not None:
            self.parsing_gen = ParsingGenerator(
                cfgs.shape_attr, cfgs.parsing_unet, cfgs.parsing_fcn
            )
        else:
            self.parsing_gen = None
        self.diffusion = AbsorbingDiffusion(
            mask_id=cfgs.transformer.codebook_size,
            num_tokens=cfgs.transformer.block_size,
            n_embed_per_head=cfgs.transformer.head_class_num,
        )
        self._tokenize_segm = jax.jit(self._tokenize_segm_impl)
        self._sample = jax.jit(
            self._sample_impl, static_argnames=("sample_steps", "decode_mode")
        )
        self._decode = jax.jit(self._decode_impl)
        self._parsing = jax.jit(self._parsing_impl)
        # small glue stages are jitted too: eagerly they cost dozens of
        # per-op dispatches (seconds over a serving tunnel, round-3 warm-boot
        # profiling: 4.6 s + 8.7 s on the first request)
        self._texture_mask = jax.jit(texture_mask_from_segm)
        self._tex_tokens = jax.jit(self._tex_tokens_impl)

    # -- stage III: parsing map -> segm tokens (sample_model.py:330-340)

    def _tokenize_segm_impl(self, params, segm: jax.Array) -> jax.Array:
        tokens = self.segm_vq.apply(
            {"params": params["segm"]}, segm, method=SegmVQVAE.tokenize
        )
        return tokens.reshape(segm.shape[0], -1)

    def tokenize_segm(self, params, segm):
        return self._tokenize_segm(params, segm)

    def _tex_tokens_impl(self, texture_mask: jax.Array) -> jax.Array:
        h, w = self.cfgs.transformer.latent_shape
        return (
            nearest_downsample_mask(texture_mask, (h, w))
            .astype(jnp.int32)
            .reshape(texture_mask.shape[0], -1)
        )

    # -- stage III: diffusion sampling of top indices (sample_model.py:256-328)

    def _sample_impl(
        self, params, key, segm_tokens, texture_tokens, sample_steps: int,
        decode_mode: str = "",
    ):
        # select_heads: emit only each position's active head — avoids the
        # [B,T,18,1024] logits tensor entirely (HBM-bound at batch >= 16).
        # flash: whole-sequence fused attention keeps the [T,T] scores in
        # VMEM (ops/attn_pallas.py) — removes the score-matrix HBM traffic
        # that made round-1 throughput peak at batch 4.
        autoregressive = self.cfgs.transformer.sampler == "autoregressive"

        # The ragged-head sort depends only on texture_tokens — constant
        # across the whole decode — so hoist the argsort/bincount out of the
        # sample scan (256 bitonic sorts -> 1; XLA's LICM does not reliably
        # lift sorts out of while bodies).  Under the dp shard_map the sort
        # must stay in-body: order/inv are flattened row indices, which are
        # shard-local there.
        head_groups = None
        if self.ragged_heads and self.mesh is None:
            head_groups = ragged_head_groups(
                texture_tokens, self.cfgs.transformer.num_output_heads
            )

        def apply_trunk(p, x_t, st, tt):
            return self.denoiser.apply(
                {"params": p},
                x_t,
                st,
                tt,
                select_heads=True,
                # the fused whole-sequence kernel is non-causal; the causal
                # (autoregressive) mode decodes through the einsum path
                flash=self.fused_attn and not autoregressive,
                ragged_heads=self.ragged_heads,
                head_groups=head_groups,
            )

        if self.mesh is not None and not self._tp_serving:
            from jax.sharding import PartitionSpec as P

            dp = P(self.dp_axis)
            apply_trunk = jax.shard_map(
                apply_trunk,
                mesh=self.mesh,
                in_specs=(P(), dp, dp, dp),
                out_specs=dp,
                check_vma=False,
            )

        def denoise(x_t):
            return apply_trunk(
                params["sampler"], x_t, segm_tokens, texture_tokens
            )

        if autoregressive:
            if self.kv_cache and self.mesh is None:
                # incremental KV-cached decode (models/ar_decode.py): one
                # single-token trunk pass per position instead of a full
                # T-token causal forward — O(T) vs O(T^2) trunk token-work,
                # teacher-forcing-exact vs the loop below
                # (tests/test_ar_kv.py).  The dp/tp shard_map serving path
                # keeps the whole-sequence loop (its batch sharding specs
                # cover the trunk call, not the raw-param scan).
                from text2human_tpu.models.ar_decode import ar_decode_kv

                local, _, _ = ar_decode_kv(
                    key,
                    params["sampler"],
                    self.cfgs.transformer,
                    segm_tokens,
                    texture_tokens,
                    self.diffusion.n_embed_per_head,
                    dtype=self.denoiser.dtype,
                )
            else:
                local, _ = sample_autoregressive(
                    key, self.diffusion, denoise, texture_tokens
                )
        elif (decode_mode or self.decode_mode) == "maskgit":
            local, _ = sample_maskgit(
                key, self.diffusion, denoise, texture_tokens, sample_steps
            )
        else:
            local, _ = sample_loop(
                key, self.diffusion, denoise, texture_tokens, sample_steps
            )
        return local

    def sample_indices(
        self, params, key, segm_tokens, texture_tokens, sample_steps=0,
        decode_mode: str = "",
    ):
        if self.cfgs.transformer.sampler == "autoregressive":
            # the AR decode always runs one pass per position and ignores
            # sample_steps AND decode_mode; normalize both static jit args so
            # request-level variations don't recompile an identical program
            steps, mode = 0, ""
        else:
            steps = sample_steps or self.cfgs.sample_steps
            # per-request decode schedule (serving offers faithful and fast
            # decodes side-by-side — cli/serve.py); '' = the boot-time default
            mode = decode_mode or self.decode_mode
            if mode not in ("absorbing", "maskgit"):
                raise ValueError(f"unknown decode_mode {mode!r}")
            if mode == self.decode_mode:
                mode = ""  # one canonical static key for the default mode
        return self._sample(
            params, key, segm_tokens, texture_tokens, steps, mode
        )

    # -- stage II decode: top indices -> image (sample_model.py:215-254)

    def _decode_impl(self, params, top_local: jax.Array, texture_mask: jax.Array):
        h, w = self.cfgs.transformer.latent_shape
        hp = params["hierarchy"]
        top_indices = top_local.reshape(-1, h, w)

        # top codebook entry -> post-quant feature
        feature_top = self.hierarchy.apply(
            {"params": hp},
            top_indices,
            texture_mask,
            method=HierarchyVQ.top_feature_from_indices,
        )

        # bottom index prediction (sample_model.py:183-213)
        ip = params["index_pred"]
        logits = self.index_pred.apply(
            {"params": ip["params"], "batch_stats": ip.get("batch_stats", {})},
            feature_top,
        )
        cb = nearest_downsample_mask(texture_mask, logits.shape[1:3]).astype(jnp.int32)
        cb = jnp.clip(cb, 0, logits.shape[3] - 1)
        sel = jnp.take_along_axis(
            logits, cb[..., None, None], axis=3
        )[:, :, :, 0, :]
        bot_indices = jnp.argmax(sel, axis=-1).astype(jnp.int32)

        # hierarchical decode
        dec = self.hierarchy.apply(
            {"params": hp},
            feature_top,
            bot_indices,
            texture_mask,
            method=HierarchyVQ.decode_from_bot_indices,
        )
        return jnp.clip((dec + 1.0) / 2.0, 0.0, 1.0)

    def decode(self, params, top_local, texture_mask):
        return self._decode(params, top_local, texture_mask)

    # -- stage I: pose -> parsing (sample_model.py:431-437)

    def _parsing_impl(self, params, pose: jax.Array, shape_attr: jax.Array):
        pg = params["parsing_gen"]
        logits = self.parsing_gen.apply(
            {"params": pg["params"], "batch_stats": pg.get("batch_stats", {})},
            pose,
            shape_attr,
        )
        return jnp.argmax(logits, axis=-1)

    def generate_parsing(self, params, pose, shape_attr):
        if self.parsing_gen is None:
            raise ValueError("pipeline built without parsing generator configs")
        return self._parsing(params, pose, shape_attr)

    # -- composite paths

    def sample_from_parsing(
        self, params, key, segm: jax.Array, texture_mask: jax.Array, sample_steps=0,
        decode_mode: str = "",
    ) -> jax.Array:
        """GT parsing + texture mask -> image batch (SampleFromParsingModel)."""
        segm_tokens = self.tokenize_segm(params, segm)
        texture_tokens = self._tex_tokens(texture_mask)
        top_local = self.sample_indices(
            params, key, segm_tokens, texture_tokens, sample_steps, decode_mode
        )
        return self.decode(params, top_local, texture_mask)

    def sample_from_pose(
        self,
        params,
        key,
        pose: jax.Array,
        shape_attr: jax.Array,
        upper_attr: jax.Array,
        lower_attr: jax.Array,
        outer_attr: jax.Array,
        sample_steps=0,
        decode_mode: str = "",
    ) -> Tuple[jax.Array, jax.Array]:
        """DensePose + attributes -> (image batch, parsing maps)
        (SampleFromPoseModel.inference, sample_model.py:421-429)."""
        segm = self.generate_parsing(params, pose, shape_attr)
        texture_mask = self._texture_mask(
            segm, upper_attr, lower_attr, outer_attr
        )
        images = self.sample_from_parsing(
            params, key, segm, texture_mask, sample_steps, decode_mode
        )
        return images, segm


def cast_sampler_params(params: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Store the sampler trunk's weights in the serving compute dtype.

    Halves the sampler's HBM footprint (~380 MB -> ~190 MB) for deployments
    that co-locate several models per chip.  Step time is *neutral* on v5e
    (measured 11.17 vs 11.25 ms/step at batch 16 — XLA already fuses the
    f32->bf16 cast into the consuming matmuls, so weight reads were never the
    bottleneck); use it for memory, not speed.  LayerNorm scales/biases stay
    f32 (the norms accumulate in f32; keeping their params exact costs
    nothing).  Only ``params['sampler']`` is touched — the conv decode stages
    keep f32 for reference parity (BENCHMARKS.md).
    """

    def cast(path, leaf):
        parts = [str(getattr(p, "key", p)) for p in path]
        if any(p.startswith("ln") for p in parts):  # ln1/ln2/ln_f
            return leaf
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    out = dict(params)
    out["sampler"] = jax.tree_util.tree_map_with_path(
        cast, params["sampler"]
    )
    return out

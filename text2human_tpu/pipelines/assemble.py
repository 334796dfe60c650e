"""Assemble SamplePipeline params from NATIVELY trained checkpoints.

The reference builds its inference model from six separately trained .pth
files (sample_model.py:124-181); `utils/torch_import.convert_pipeline_checkpoints`
covers that import path.  This module covers the all-native story: a user who
trained the six jobs with THIS framework (cli/train.py orbax checkpoints)
assembles them into the single pipeline params tree that `cli/sample.py` /
`cli/serve.py` consume — no torch round-trip.

Checkpoint expectations (what cli/train.py writes per val epoch):
  top / bottom   {"state": {"params": {"gen": ..., "disc": ...}, ...}}
  segm / sampler {"state": {"params": ...}}
  index_pred / parsing_gen
                 {"state": {"params": ..., "batch_stats": ...}}
Raw TrainState-shaped dicts (no "state" wrapper) are accepted too.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

_HIER_BOT_KEYS = (
    "bot_encoder",
    "bot_decoder_res",
    "bot_quantize",
    "bot_quant_conv",
    "bot_post_quant_conv",
)


def _state(tree: Dict[str, Any]) -> Dict[str, Any]:
    return tree.get("state", tree)


def _params(tree: Dict[str, Any]) -> Any:
    return _state(tree)["params"]


def _gen(tree: Dict[str, Any], what: str) -> Any:
    params = _params(tree)
    if not isinstance(params, dict) or "gen" not in params:
        keys = sorted(params)[:8] if isinstance(params, dict) else type(params).__name__
        raise ValueError(
            f"{what} checkpoint has no 'gen' subtree — expected a GAN-trainer "
            f"checkpoint (params: {keys})"
        )
    return params["gen"]


def _with_stats(tree: Dict[str, Any], what: str) -> Dict[str, Any]:
    state = _state(tree)
    stats = state.get("batch_stats")
    if not stats:
        # these nets always contain BatchNorm: an empty collection means a
        # partial/corrupt restore, and masking it here would only surface
        # later as a cryptic flax error inside the first jitted request
        raise ValueError(
            f"{what} checkpoint has no batch_stats collection — partial or "
            "corrupt restore? (IndexPredictionNet/ParsingGenerator always "
            "carry BatchNorm statistics)"
        )
    return {"params": state["params"], "batch_stats": stats}


def assemble_pipeline_params(
    top: Dict[str, Any],
    bottom: Dict[str, Any],
    segm: Dict[str, Any],
    sampler: Dict[str, Any],
    index_pred: Dict[str, Any],
    parsing_gen: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Six native trainer checkpoints -> SamplePipeline params.

    Mirrors the reference's checkpoint dependency graph: the hierarchy's
    top components come from the top-VQGAN checkpoint while the bottom
    checkpoint's finetuned decoder wins (sample_model.py:139-152 — same
    semantics as torch_import.convert_hierarchy_params).
    """
    top_gen = _gen(top, "top")
    bot_gen = _gen(bottom, "bottom")
    missing = [k for k in _HIER_BOT_KEYS if k not in bot_gen]
    if missing:
        raise ValueError(
            f"bottom checkpoint is not a hierarchy checkpoint: missing {missing}"
        )
    top_missing = [
        k for k in ("encoder", "quantize", "quant_conv", "post_quant_conv")
        if k not in top_gen
    ]
    if top_missing:
        # symmetric with the bottom check: swapped --top/--bottom must name
        # the wrong argument, not die with a bare KeyError('encoder')
        raise ValueError(
            f"top checkpoint is not a top-VQGAN checkpoint: missing "
            f"{top_missing} (swapped --top/--bottom?)"
        )
    params = {
        "hierarchy": {
            "top_encoder": top_gen["encoder"],
            "top_quantize": top_gen["quantize"],
            "top_quant_conv": top_gen["quant_conv"],
            "top_post_quant_conv": top_gen["post_quant_conv"],
            "decoder": bot_gen["decoder"],
            **{k: bot_gen[k] for k in _HIER_BOT_KEYS},
        },
        "segm": _params(segm),
        "sampler": _params(sampler),
        "index_pred": _with_stats(index_pred, "index_pred"),
    }
    if parsing_gen is not None:
        params["parsing_gen"] = _with_stats(parsing_gen, "parsing_gen")
    return params


def assemble_pipeline_from_checkpoints(
    top_path: str,
    bottom_path: str,
    segm_path: str,
    sampler_path: str,
    index_pred_path: str,
    parsing_gen_path: str = "",
) -> Dict[str, Any]:
    """Same, from orbax checkpoint directories on disk."""
    from text2human_tpu.utils.checkpoint import load_checkpoint

    return assemble_pipeline_params(
        load_checkpoint(top_path),
        load_checkpoint(bottom_path),
        load_checkpoint(segm_path),
        load_checkpoint(sampler_path),
        load_checkpoint(index_pred_path),
        load_checkpoint(parsing_gen_path) if parsing_gen_path else None,
    )

"""One-command, artifact-gated parity runner against the reference release.

The framework's remaining parity claims are gated on external artifacts that
were never available in the build environment (ROADMAP.md "Parity gaps"):
the released ``.pth`` checkpoint zoo, the all-MiniLM-L6-v2 sentence encoder,
LPIPS VGG16 weights, and the FID Inception checkpoint.  This CLI turns all
four into ONE deterministic action for the day a directory with them exists:

    python -m text2human_tpu.cli.parity --artifacts /path/to/dir \
        [--out parity_report.json] [--work workdir] [--cpu] \
        [--real-images DIR] [--batch 4] [--num-batches 2]

For each artifact found it runs the full check; missing artifacts are
recorded as "missing" and skipped (exit code stays 0 — absence is the
expected state here); a PRESENT artifact whose check fails exits 1.

Checks (reference release file names, README.md "Pretrained Models"):
  vqvae_top.pth vqvae_bottom.pth parsing_token.pth sampler.pth
  index_pred_net.pth parsing_gen.pth
      -> cli/convert import-pipeline (exact 'xla' VQ search), then seeded
         sample_from_pose batches; writes PNGs + the sampled top-index
         arrays + SHA256 fingerprints so the run is byte-comparable against
         the reference implementation fed the same inputs
         (/root/reference/models/sample_model.py:124-181,256-328).
  all-MiniLM-L6-v2/   (HF checkpoint directory)
      -> TransformersEncoder over the reference phrase workflow: shape
         attributes for a probe battery, recorded alongside the calibrated
         lexical fallback for agreement stats (language_utils.py:93-277).
  vgg.pth | lpips_vgg.pth | vgg16.pth  (torchvision VGG16 'features.*' +
      lpips 'lin*.model.1.weight' heads in one state dict)
      -> convert + LPIPS forward on deterministic probes; finite + symmetric
         + zero-on-identical (vqgan_model.py:6,252).
  pt_inception-2015-12-05-6726825d.pth | pt_inception.pth | inception_v3.pth
      -> standard FID between the zoo's sampled images and --real-images.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import os.path as osp
import time
from typing import Any, Dict

import numpy as np

ZOO_FILES = {
    "top": "vqvae_top.pth",
    "bottom": "vqvae_bottom.pth",
    "segm": "parsing_token.pth",
    "sampler": "sampler.pth",
    "index_pred": "index_pred_net.pth",
    "parsing_gen": "parsing_gen.pth",
}
MINILM_DIRS = ("all-MiniLM-L6-v2", "sentence-transformers_all-MiniLM-L6-v2")
LPIPS_FILES = ("vgg.pth", "lpips_vgg.pth", "vgg16.pth")
INCEPTION_FILES = (
    "pt_inception-2015-12-05-6726825d.pth", "pt_inception.pth",
    "inception_v3.pth",
)

SHAPE_PROBES = [
    "a woman, T-shirt, pants",
    "a man, long-sleeve shirt, shorts",
    "a lady, sleeveless dress",
    "a woman, short-sleeve T-shirt, long skirt, outer clothing",
]
TEXTURE_PROBES = [
    "pure color, pure color",
    "stripe, lattice",
    "floral, denim",
]


def _sha(arr: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()[:16]


def _find(art_dir: str, names) -> str:
    for n in names:
        p = osp.join(art_dir, n)
        if osp.exists(p):
            return p
    return ""


def check_zoo(art_dir: str, work: str, batch: int, num_batches: int,
              seed: int) -> Dict[str, Any]:
    paths = {k: osp.join(art_dir, v) for k, v in ZOO_FILES.items()}
    missing = [v for k, v in ZOO_FILES.items()
               if not osp.exists(paths[k])]
    if missing:
        return {"status": "missing", "missing_files": missing}

    import jax
    import jax.numpy as jnp

    from text2human_tpu.cli.builders import build_pipeline
    from text2human_tpu.cli.sample import load_params
    from text2human_tpu.config import parse
    from text2human_tpu.data.datasets import normalize_densepose
    from text2human_tpu.ops.quantize import set_vq_impl
    from text2human_tpu.utils.checkpoint import save_checkpoint
    from text2human_tpu.utils.language import (
        generate_shape_attributes, generate_texture_attributes,
    )
    from text2human_tpu.utils.torch_import import convert_pipeline_checkpoints

    # exact codebook search: this IS the headline parity check — the fused
    # Pallas kernel's ~0.1% near-tie index flips must not touch it
    set_vq_impl("xla")

    ckpt = osp.join(work, "pipeline_from_zoo")
    params_tree = convert_pipeline_checkpoints(
        paths["top"], paths["bottom"], paths["segm"], paths["sampler"],
        paths["index_pred"], paths["parsing_gen"],
    )
    save_checkpoint(ckpt, params_tree)

    opt = parse("configs/sample_from_pose.yml", is_train=False)
    pipe = build_pipeline(opt)
    params = load_params(pipe, opt, synthetic=False, ckpt=ckpt)

    res = int(opt.get("top_resolution") or 512)
    rng = np.random.default_rng(seed)
    out_dir = osp.join(work, "zoo_samples")
    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.key(seed)
    records = []
    from PIL import Image

    for b in range(num_batches):
        # deterministic synthetic densepose probes (the released model was
        # trained on DeepFashion denseposes; these fingerprints are for
        # byte-comparison against the reference fed the SAME arrays, which
        # this seeding reproduces anywhere)
        pose = rng.uniform(0, 24, (batch, res, res // 2)).astype(np.float32)
        pose_n = jnp.asarray(normalize_densepose(pose), jnp.float32)[..., None]
        shape_attr = jnp.asarray(
            np.stack([
                generate_shape_attributes(SHAPE_PROBES[i % len(SHAPE_PROBES)])
                for i in range(batch)
            ]), jnp.int32)
        tex = [generate_texture_attributes(
            TEXTURE_PROBES[i % len(TEXTURE_PROBES)])[:3]
            for i in range(batch)]
        up, lo, ou = (jnp.asarray([t[i] for t in tex], jnp.int32)
                      for i in range(3))
        key, sub = jax.random.split(key)
        # fingerprint the sampled TOP indices too: index-exactness is the
        # strongest cross-implementation signal (images add decode conv
        # float noise)
        segm = pipe.generate_parsing(params, pose_n, shape_attr)
        texture_mask = pipe._texture_mask(segm, up, lo, ou)
        segm_tokens = pipe.tokenize_segm(params, segm)
        texture_tokens = pipe._tex_tokens(texture_mask)
        top_local = pipe.sample_indices(
            params, sub, segm_tokens, texture_tokens
        )
        images = pipe.decode(params, top_local, texture_mask)
        images = np.asarray(images)
        top_local = np.asarray(top_local)
        for i in range(batch):
            arr = np.clip(images[i] * 255.0 + 0.5, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(
                osp.join(out_dir, f"zoo_b{b}_{i}.png")
            )
        np.save(osp.join(out_dir, f"top_indices_b{b}.npy"), top_local)
        records.append({
            "batch": b,
            "pose_sha": _sha(pose),
            "top_indices_sha": _sha(top_local),
            "images_sha": _sha(
                np.clip(images * 255.0 + 0.5, 0, 255).astype(np.uint8)
            ),
            "top_index_mean": float(top_local.mean()),
            "top_index_unique": int(len(np.unique(top_local))),
        })
    return {
        "status": "ok",
        "checkpoint": ckpt,
        "samples_dir": out_dir,
        "seed": seed,
        "vq_impl": "xla",
        "batches": records,
    }


def check_minilm(art_dir: str) -> Dict[str, Any]:
    path = _find(art_dir, MINILM_DIRS)
    if not path:
        return {"status": "missing", "searched": list(MINILM_DIRS)}
    from text2human_tpu.utils.language import (
        LexicalEncoder, TransformersEncoder, generate_shape_attributes,
    )

    enc = TransformersEncoder(path)
    lex = LexicalEncoder()
    rows = []
    agree = 0
    for text in SHAPE_PROBES:
        a_minilm = generate_shape_attributes(text, encoder=enc)
        a_lex = generate_shape_attributes(text, encoder=lex)
        match = a_minilm == a_lex
        agree += int(match)
        rows.append({"text": text, "minilm": a_minilm, "lexical": a_lex,
                     "agree": match})
    return {
        "status": "ok",
        "model_path": path,
        "probes": rows,
        "lexical_agreement": f"{agree}/{len(SHAPE_PROBES)}",
    }


def check_lpips(art_dir: str) -> Dict[str, Any]:
    path = _find(art_dir, LPIPS_FILES)
    if not path:
        return {"status": "missing", "searched": list(LPIPS_FILES)}
    import jax.numpy as jnp

    from text2human_tpu.losses.perceptual import LPIPS, load_lpips_vars

    variables = load_lpips_vars(path)
    lpips = LPIPS()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    d_xy = np.asarray(lpips.apply(variables, x, y)).mean()
    d_yx = np.asarray(lpips.apply(variables, y, x)).mean()
    d_xx = np.asarray(lpips.apply(variables, x, x)).mean()
    ok = (np.isfinite(d_xy) and d_xy > 0 and abs(d_xy - d_yx) < 1e-5
          and abs(d_xx) < 1e-6)
    return {
        "status": "ok" if ok else "failed",
        "weights": path,
        "d(x,y)": float(d_xy),
        "d(y,x)": float(d_yx),
        "d(x,x)": float(d_xx),
    }


def check_fid(art_dir: str, work: str, real_images: str,
              zoo_result: Dict[str, Any]) -> Dict[str, Any]:
    path = _find(art_dir, INCEPTION_FILES)
    if not path:
        return {"status": "missing", "searched": list(INCEPTION_FILES)}
    if not real_images:
        return {"status": "skipped", "reason": "--real-images not given"}
    if zoo_result.get("status") != "ok":
        return {"status": "skipped", "reason": "no zoo samples to score"}
    from text2human_tpu.cli.evaluate import _image_batches
    from text2human_tpu.utils.fid import (
        compute_fid, inception_extractor_from_torch,
    )

    extract = inception_extractor_from_torch(path)
    size = (299, 299)
    fid = compute_fid(
        _image_batches(real_images, size, 16),
        _image_batches(zoo_result["samples_dir"], size, 16),
        extract,
    )
    return {"status": "ok", "weights": path, "fid": float(fid),
            "real": real_images, "fake": zoo_result["samples_dir"]}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--artifacts", required=True,
                        help="directory holding the released artifacts")
    parser.add_argument("--out", default="parity_report.json")
    parser.add_argument("--work", default="parity_work")
    parser.add_argument("--real-images", default="",
                        help="directory of real images for absolute FID")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--num-batches", type=int, default=2)
    parser.add_argument("--seed", type=int, default=2021)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from text2human_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(args.work, exist_ok=True)

    report: Dict[str, Any] = {
        "artifacts_dir": osp.abspath(args.artifacts),
        "started": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    failures = []
    for name, fn in (
        ("checkpoint_zoo", lambda: check_zoo(
            args.artifacts, args.work, args.batch, args.num_batches,
            args.seed)),
        ("minilm", lambda: check_minilm(args.artifacts)),
        ("lpips", lambda: check_lpips(args.artifacts)),
    ):
        try:
            report[name] = fn()
        except Exception as e:  # a present-but-broken artifact is a failure
            report[name] = {"status": "failed", "error": f"{type(e).__name__}: {e}"}
        if report[name]["status"] == "failed":
            failures.append(name)
        print(f"{name}: {report[name]['status']}")

    try:
        report["fid"] = check_fid(
            args.artifacts, args.work, args.real_images,
            report.get("checkpoint_zoo", {}),
        )
    except Exception as e:
        report["fid"] = {"status": "failed", "error": f"{type(e).__name__}: {e}"}
    if report["fid"]["status"] == "failed":
        failures.append("fid")
    print(f"fid: {report['fid']['status']}")

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {args.out}")
    if failures:
        raise SystemExit(f"parity checks failed: {failures}")


if __name__ == "__main__":
    main()

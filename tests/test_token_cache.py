"""Pre-tokenized training cache: builder, dataset, trainer parity, CLI.

The cache removes the per-step frozen-tokenizer forwards the reference pays
on every iteration (transformer_model.py:153-170,
hierarchy_inference_model.py:178-197) by tokenizing the dataset once into
integer-index memmaps (data/token_cache.py, cli/tokenize.py).
"""

import os
import os.path as osp

import jax
import numpy as np
import pytest

from text2human_tpu.data.token_cache import (
    TokenDataset,
    build_token_cache,
    flip_sample,
)


@pytest.fixture(autouse=True)
def _isolated(isolated_root):
    """Every test runs in a tmp experiments root (conftest.isolated_root)."""
    yield


def _fake_dataset(n=5):
    rng = np.random.default_rng(0)
    return [
        {
            "image": rng.standard_normal((8, 6, 3)).astype(np.float32),
            "img_name": f"img_{i:03d}.png",
        }
        for i in range(n)
    ]


def _fake_tokenizer(batch):
    # deterministic "tokens": sign pattern of the image's first channel
    img = batch["image"]
    return {"tok": (img[..., 0] > 0).astype(np.int64)}


class TestBuilder:
    def test_roundtrip_with_flip_variants(self, tmp_path):
        ds = _fake_dataset()
        cache = str(tmp_path / "cache")
        meta = build_token_cache(
            cache, ds, _fake_tokenizer, batch_size=2, variants=2
        )
        assert meta["num_samples"] == 5 and meta["variants"] == 2
        # int64 tokenizer output in {0,1} stored as the smallest dtype
        raw = np.load(osp.join(cache, "tok.npy"), mmap_mode="r")
        assert raw.dtype == np.int8 and raw.shape == (2, 5, 8, 6)

        tds = TokenDataset(cache)
        assert len(tds) == 5
        for i, s in enumerate(ds):
            item = tds[i]
            assert item["tok"].dtype == np.int32
            np.testing.assert_array_equal(
                item["tok"], _fake_tokenizer({"image": s["image"][None]})["tok"][0]
            )
            assert item["img_name"] == s["img_name"]
        # variant 1 holds tokens of the FLIPPED image (not flipped tokens)
        flipped = TokenDataset(cache, xflip=True)
        flip_tok = _fake_tokenizer(
            {"image": flip_sample(ds[0])["image"][None]}
        )["tok"][0]
        got = {tuple(np.asarray(flipped[0]["tok"]).ravel()) for _ in range(32)}
        want = {
            tuple(flip_tok.ravel()),
            tuple(np.asarray(tds[0]["tok"]).ravel()),
        }
        assert got == want  # both variants appear under random xflip

    def test_tail_batch_padding(self, tmp_path):
        """5 samples at batch 4: the padded tail row must not leak."""
        ds = _fake_dataset(5)
        cache = str(tmp_path / "c")
        build_token_cache(cache, ds, _fake_tokenizer, batch_size=4, variants=1)
        tds = TokenDataset(cache)
        np.testing.assert_array_equal(
            tds[4]["tok"],
            _fake_tokenizer({"image": ds[4]["image"][None]})["tok"][0],
        )

    def test_xflip_requires_two_variants(self, tmp_path):
        cache = str(tmp_path / "c1")
        build_token_cache(cache, _fake_dataset(2), _fake_tokenizer, variants=1)
        with pytest.raises(ValueError, match="variants=1"):
            TokenDataset(cache, xflip=True)

    def test_rejects_bogus_variant_counts(self, tmp_path):
        """variants>2 would store unflipped duplicates and skew xflip odds."""
        with pytest.raises(ValueError, match="variants"):
            build_token_cache(
                str(tmp_path / "c"), _fake_dataset(2), _fake_tokenizer,
                variants=3,
            )

    def test_dtype_widens_mid_build(self, tmp_path):
        """The field dtype is sized from the first batch; a later batch that
        outgrows it must widen the memmap, not abort the build."""
        ds = _fake_dataset(4)

        def tok(batch):
            # first batch fits int8, the second does not
            base = (batch["image"][..., 0] > 0).astype(np.int64)
            names = batch["img_name"]
            if "img_003.png" in names:
                base = base + 1000
            return {"tok": base}

        cache = str(tmp_path / "wide")
        build_token_cache(cache, ds, tok, batch_size=2, variants=1)
        raw = np.load(osp.join(cache, "tok.npy"), mmap_mode="r")
        assert raw.dtype == np.int16
        tds = TokenDataset(cache)
        # early (narrow-written) and late (wide) rows both read back exactly
        np.testing.assert_array_equal(
            tds[0]["tok"], tok({"image": ds[0]["image"][None],
                                "img_name": [ds[0]["img_name"]]})["tok"][0],
        )
        np.testing.assert_array_equal(
            tds[3]["tok"], tok({"image": ds[3]["image"][None],
                                "img_name": [ds[3]["img_name"]]})["tok"][0],
        )


class TestTrainConsumption:
    """cli/train.py's token-cache consumption rules."""

    def _cache(self, tmp_path, variants=2, synthetic=True):
        cache = str(tmp_path / "cache")
        build_token_cache(
            cache, _fake_dataset(3), _fake_tokenizer, batch_size=2,
            variants=variants, extra_meta={"synthetic": synthetic},
        )
        return cache

    def test_missing_configured_cache_raises(self, tmp_path):
        """A configured-but-absent cache must never silently fall back to
        the ~2x-slower pixel path."""
        from text2human_tpu.cli.train import make_dataset

        opt = {"model_type": "TransformerTextureAwareModel",
               "token_cache": str(tmp_path / "nope")}
        with pytest.raises(FileNotFoundError, match="token_cache"):
            make_dataset(opt, "train", synthetic=False)

    def test_xflip_defaults_on_for_train_split(self, tmp_path):
        """The reference train scripts hard-code xflip=True
        (train_sampler.py:44); cached training must not silently drop the
        augmentation its 2x build cost paid for."""
        from text2human_tpu.cli.train import make_dataset

        root = str(tmp_path)
        for split in ("train", "val"):
            build_token_cache(
                osp.join(root, split), _fake_dataset(3), _fake_tokenizer,
                batch_size=2, variants=2,
            )
        opt = {"model_type": "TransformerTextureAwareModel",
               "token_cache": root}
        assert make_dataset(opt, "train", False).xflip is True
        assert make_dataset(opt, "val", False).xflip is False
        assert make_dataset(
            {**opt, "xflip": False}, "train", False
        ).xflip is False

    def test_real_cache_requires_hierarchy_checkpoints(self, tmp_path):
        """Cached index-pred gathers against the frozen codebooks every step;
        consuming a REAL cache with random-init codebooks must fail loudly."""
        from text2human_tpu.cli.builders import build_trainer
        from text2human_tpu.cli.train import TrainLoop
        from text2human_tpu.config import parse

        opt = parse("configs/debug/index_pred_debug.yml", is_train=True)
        loop = TrainLoop(
            opt, build_trainer(opt), synthetic=False,
            token_meta={"synthetic": False},
        )
        with pytest.raises(FileNotFoundError, match="top_vae_path"):
            loop.init({"top_local": np.zeros((1, 4), np.int32)})

    def test_synthetic_cache_allows_random_frozen(self, tmp_path):
        """Smoke caches (built --synthetic) keep the random-init fallback."""
        from text2human_tpu.cli.builders import build_trainer
        from text2human_tpu.cli.train import TrainLoop
        from text2human_tpu.config import parse

        opt = parse("configs/debug/index_pred_debug.yml", is_train=True)
        loop = TrainLoop(
            opt, build_trainer(opt), synthetic=False,
            token_meta={"synthetic": True},
        )
        assert loop._consuming_real_cache() is False


class TestIndexPredTokenParity:
    """prepare_from_tokens(tokenize(batch)) must reproduce prepare(batch)."""

    def test_feature_top_reconstruction(self):
        from text2human_tpu.cli.builders import build_trainer
        from text2human_tpu.config import parse

        opt = parse("configs/debug/index_pred_debug.yml", is_train=True)
        t = build_trainer(opt)
        key = jax.random.key(0)
        img = jax.random.uniform(key, (2, 32, 32, 3), minval=-1, maxval=1)
        mask = jax.random.randint(jax.random.key(1), (2, 32, 32), 0, 18).astype(
            np.float32
        )
        vq = t.hierarchy.init(jax.random.key(2), img, mask)["params"]
        batch = {"image": img, "texture_mask": mask}

        direct = t.prepare(vq, batch)
        tokens = t.tokenize(vq, batch)
        rebuilt = t.prepare_from_tokens(vq, tokens)

        np.testing.assert_array_equal(
            np.asarray(direct["gt_indices"]), np.asarray(rebuilt["gt_indices"])
        )
        np.testing.assert_array_equal(
            np.asarray(direct["cb_ids"]), np.asarray(rebuilt["cb_ids"])
        )
        # forward z_q values ARE codebook rows, so gather + the post-quant
        # 1x1 conv reproduces the float feature
        np.testing.assert_allclose(
            np.asarray(direct["feature_top"]),
            np.asarray(rebuilt["feature_top"]),
            atol=1e-5,
        )


class TestTokenizeCLI:
    def _write_cfg(self, src, tmp_path, cache_dir, name):
        txt = open(src).read()
        txt = txt.replace(f"name: {name}", f"name: {name}_cache")
        txt += f"\ntoken_cache: {cache_dir}\n"
        dst = tmp_path / osp.basename(src)
        dst.write_text(txt)
        return str(dst)

    def test_sampler_cache_train_e2e(self, tmp_path):
        """tokenize --synthetic -> cached (pixel-free) training reaches the
        val epoch and writes the sample triptych."""
        from text2human_tpu.cli import tokenize as tok_cli
        from text2human_tpu.cli import train as train_cli

        cache = str(tmp_path / "tok")
        tok_cli.main([
            "-opt", "configs/debug/sampler_debug.yml",
            "--out", cache, "--synthetic", "--batch-size", "2",
        ])
        for split in ("train", "val"):
            assert osp.exists(osp.join(cache, split, "meta.json"))
        assert np.load(osp.join(cache, "train", "x0_cont.npy"),
                       mmap_mode="r").shape[0] == 2  # flip variants

        cfg = self._write_cfg(
            "configs/debug/sampler_debug.yml", tmp_path, cache, "sampler_debug"
        )
        train_cli.main(["-opt", cfg])
        assert os.path.exists("experiments/sampler_debug_cache/metrics.jsonl")
        assert os.path.exists(
            "experiments/sampler_debug_cache/visualization/epoch0_sample.png"
        )

    def test_index_pred_cache_train_e2e(self, tmp_path):
        from text2human_tpu.cli import tokenize as tok_cli
        from text2human_tpu.cli import train as train_cli

        cache = str(tmp_path / "tok_ip")
        tok_cli.main([
            "-opt", "configs/debug/index_pred_debug.yml",
            "--out", cache, "--synthetic", "--batch-size", "2",
        ])
        cfg = self._write_cfg(
            "configs/debug/index_pred_debug.yml", tmp_path, cache,
            "index_pred_debug",
        )
        train_cli.main(["-opt", cfg])
        assert os.path.exists(
            "experiments/index_pred_debug_cache/metrics.jsonl"
        )
        assert os.path.exists(
            "experiments/index_pred_debug_cache/visualization/"
            "epoch0_hierarchy.png"
        )

    def test_rejects_jobs_without_frozen_tokenizers(self, tmp_path):
        from text2human_tpu.cli import tokenize as tok_cli

        with pytest.raises(SystemExit, match="no frozen tokenizers"):
            tok_cli.main([
                "-opt", "configs/debug/parsing_gen_debug.yml",
                "--out", str(tmp_path / "x"), "--synthetic",
            ])

    def test_rejects_real_build_without_checkpoints(self, tmp_path):
        """A cache built from random-init frozen tokenizers is silent
        garbage — non-synthetic builds refuse without the checkpoints."""
        from text2human_tpu.cli import tokenize as tok_cli

        with pytest.raises(SystemExit, match="img_ae_path"):
            tok_cli.main([
                "-opt", "configs/debug/sampler_debug.yml",
                "--out", str(tmp_path / "x"),
            ])


def _hier_batch(res=32, b=2, seed=0):
    k = jax.random.key(seed)
    img = jax.random.uniform(k, (b, res, res, 3), minval=-1, maxval=1)
    mask = jax.random.randint(
        jax.random.key(seed + 1), (b, res, res), 0, 18
    ).astype(np.float32)
    return {"image": img, "texture_mask": mask}


class TestHierarchyHybridCache:
    """Bottom-hierarchy GAN job: pixels + cached frozen-top indices
    (HybridTokenDataset) must train identically to the pixel-only path."""

    def _trainer(self):
        from text2human_tpu.cli.builders import build_trainer
        from text2human_tpu.config import parse

        opt = parse("configs/debug/vqvae_bottom_debug.yml", is_train=True)
        return build_trainer(opt)

    def test_forward_with_top_matches_pixel_path(self):
        t = self._trainer()
        batch = _hier_batch()
        params = t.init_gen_params(
            jax.random.key(2), batch["image"], batch["texture_mask"]
        )
        toks = t.tokenize(params, batch)
        plain = t.ae_apply(params, batch["image"], batch["texture_mask"])
        cached = t.ae_apply(
            params, batch["image"], batch["texture_mask"],
            toks["top_local"], toks["top_cb"],
        )
        # forward z_q values ARE codebook rows: gather + the 1x1 post-quant
        # conv reproduces top_encode's feature up to float re-rounding of
        # the straight-through form z + (q - z), which the decoder amplifies
        # to ~1e-4 absolute (relative error is unbounded near zero outputs)
        for a, b_ in zip(plain, cached):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-3, atol=2e-4
            )

    def test_cached_train_step_matches_pixel_step(self):
        t = self._trainer()
        batch = _hier_batch()
        gen = t.init_gen_params(
            jax.random.key(2), batch["image"], batch["texture_mask"]
        )
        toks = {k: np.asarray(v) for k, v in t.tokenize(gen, batch).items()}
        state = t.init_state(jax.random.key(3), gen, batch["image"])
        # host snapshot: the jitted step donates its input state buffers
        snap = jax.tree.map(np.asarray, jax.device_get(state))

        def run(extra):
            import jax.numpy as jnp

            s = jax.tree.map(jnp.asarray, snap)
            b = {**batch, **extra}
            s, logs = t.train_step(s, b, jax.random.key(7))
            return logs, s

        logs_px, s_px = run({})
        logs_tok, s_tok = run(
            {"top_local": toks["top_local"], "top_cb": toks["top_cb"]}
        )
        for k in logs_px:
            np.testing.assert_allclose(
                float(logs_px[k]), float(logs_tok[k]), rtol=1e-3, atol=1e-5,
                err_msg=f"metric {k} diverged between pixel and cached paths",
            )
        # generator gradients must agree in relative L2 (comparing params
        # AFTER one Adam step would be meaningless: a fresh Adam step is
        # ~lr*sign(g), so epsilon-scale grad noise flips whole entries)
        import jax.numpy as jnp

        def grads(extra):
            b = {**batch, **extra}
            extras = tuple(b[k] for k in t.ae_extra_keys if k in b)
            g, _, _ = t.gen_grads_and_metrics(
                snap.params["gen"], snap.params["disc"],
                snap.batch_stats["disc"], jnp.zeros((), jnp.int32),
                b["image"], b["texture_mask"], jax.random.key(7), extras,
            )
            return np.concatenate(
                [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(g)]
            )

        g_px = grads({})
        g_tok = grads({"top_local": toks["top_local"], "top_cb": toks["top_cb"]})
        rel = np.linalg.norm(g_px - g_tok) / (np.linalg.norm(g_px) + 1e-12)
        # the cached quant_top matches top_encode to ~6e-8 absolute, but the
        # random-init GAN head at these tiny dims amplifies input rounding
        # ~1e6x (measured control: an 8e-9 random perturbation of quant_top
        # already moves the full gen grads 3.3e-3 relative; the L1-only
        # grads move just 2.6e-5).  5e-2 separates that conditioning noise
        # from real bugs (wrong codebook/mask/flip => O(1) diff).
        assert rel < 5e-2, f"gen grad relative L2 diff {rel:.2e}"

    def test_hybrid_dataset_flip_sync(self, tmp_path):
        """The flip variant drawn for the pixels must be the variant the
        tokens are read from — a mismatch would train bottom codes against
        the wrong top features on every flipped sample."""
        from text2human_tpu.data.token_cache import HybridTokenDataset

        base = [
            {
                "image": np.arange(48, dtype=np.float32).reshape(4, 4, 3),
                "texture_mask": np.zeros((4, 4), np.float32),
                "img_name": f"img_{i:03d}.png",
            }
            for i in range(3)
        ]

        def tok(batch):
            # "tokens" = variant fingerprint of the (possibly flipped) image
            return {"top_local": batch["image"][:, 0, :2, 0].astype(np.int64)}

        cache = str(tmp_path / "hyb")
        build_token_cache(cache, base, tok, batch_size=2, variants=2)
        ds = HybridTokenDataset(base, cache, xflip=True)
        seen = set()
        for _ in range(32):
            s = ds[0]
            expect = tok({"image": s["image"][None]})["top_local"][0]
            np.testing.assert_array_equal(s["top_local"], expect)
            seen.add(tuple(np.asarray(s["top_local"]).ravel()))
        assert len(seen) == 2  # both variants appear under random xflip

    def test_hybrid_dataset_guards(self, tmp_path):
        from text2human_tpu.data.token_cache import HybridTokenDataset

        base = [
            {"image": np.zeros((4, 4, 3), np.float32),
             "img_name": f"img_{i}.png"}
            for i in range(3)
        ]
        cache = str(tmp_path / "g")
        build_token_cache(
            cache, base, lambda b: {"top_local": b["image"][:, 0, 0, :1]},
            batch_size=2, variants=1,
        )
        with pytest.raises(ValueError, match="variants=1"):
            HybridTokenDataset(base, cache, xflip=True)
        with pytest.raises(ValueError, match="3 samples"):
            HybridTokenDataset(base[:2], cache)

        class FlippingBase(list):
            xflip = True

        with pytest.raises(ValueError, match="xflip=False"):
            HybridTokenDataset(FlippingBase(base), cache)

        misnamed = [dict(s, img_name="other.png") for s in base]
        with pytest.raises(ValueError, match="misaligned"):
            HybridTokenDataset(misnamed, cache)[0]

    def test_make_dataset_wires_hybrid(self, tmp_path, monkeypatch):
        """cli/train.make_dataset: token_cache + hierarchy job -> a
        HybridTokenDataset over an xflip-disabled pixel base."""
        from text2human_tpu.cli import train as train_cli
        from text2human_tpu.data.token_cache import HybridTokenDataset

        base = [
            {"image": np.zeros((4, 4, 3), np.float32),
             "texture_mask": np.zeros((4, 4), np.float32),
             "img_name": f"img_{i}.png"}
            for i in range(2)
        ]
        cache = str(tmp_path / "mk")
        build_token_cache(
            cache + "/train", base,
            lambda b: {"top_local": b["image"][:, 0, 0, :1]},
            batch_size=2, variants=2,
        )
        captured = {}

        def fake_ds(img_dir, segm_dir, pose_dir, ann, factor, xflip):
            captured["xflip"] = xflip
            return base

        monkeypatch.setattr(
            train_cli, "DeepFashionAttrSegmDataset", fake_ds
        )
        opt = {
            "model_type": "HierarchyVQSpatialTextureAwareModel",
            "token_cache": cache,
            "train_img_dir": "x", "test_img_dir": "x", "segm_dir": "x",
            "pose_dir": "x", "train_ann_file": "x",
        }
        ds = train_cli.make_dataset(opt, "train", synthetic=False)
        assert isinstance(ds, HybridTokenDataset)
        assert captured["xflip"] is False  # hybrid applies the flip itself
        assert ds.xflip is True  # train split defaults xflip on


class TestHierarchyTokenizeCLI:
    def test_synthetic_build_writes_top_fields(self, tmp_path):
        from text2human_tpu.cli import tokenize as tok_cli

        cache = str(tmp_path / "tok_hier")
        tok_cli.main([
            "-opt", "configs/debug/vqvae_bottom_debug.yml",
            "--out", cache, "--synthetic", "--batch-size", "2",
            "--splits", "train",
        ])
        meta = osp.join(cache, "train", "meta.json")
        assert osp.exists(meta)
        raw = np.load(osp.join(cache, "train", "top_local.npy"), mmap_mode="r")
        assert raw.shape[0] == 2  # both flip variants
        assert osp.exists(osp.join(cache, "train", "top_cb.npy"))

    def test_rejects_real_build_without_top_checkpoint(self, tmp_path):
        from text2human_tpu.cli import tokenize as tok_cli

        with pytest.raises(SystemExit, match="top_vae_path"):
            tok_cli.main([
                "-opt", "configs/debug/vqvae_bottom_debug.yml",
                "--out", str(tmp_path / "x"),
            ])


class TestCheckpointFingerprint:
    """Cached indices gathered against a DIFFERENT checkpoint than the cache
    was built from must fail loudly (cli/train.py:_check_cache_checkpoints)."""

    def test_mismatched_checkpoint_rejected(self, tmp_path):
        from text2human_tpu.cli.builders import build_trainer
        from text2human_tpu.cli.train import TrainLoop
        from text2human_tpu.config import parse
        from text2human_tpu.data.token_cache import checkpoint_fingerprint

        ckpt = tmp_path / "top.pth"
        ckpt.write_bytes(b"original checkpoint bytes")
        fp = checkpoint_fingerprint(str(ckpt))

        opt = parse("configs/debug/vqvae_bottom_debug.yml", is_train=True)
        opt["top_vae_path"] = str(ckpt)
        loop = TrainLoop(
            opt, build_trainer(opt), synthetic=False,
            token_meta={"synthetic": False,
                        "checkpoints": {"top_vae_path": fp}},
        )
        loop._check_cache_checkpoints()  # same bytes: fine

        ckpt.write_bytes(b"re-exported, different weights")
        with pytest.raises(ValueError, match="different top_vae_path"):
            loop._check_cache_checkpoints()

    def test_legacy_cache_without_fingerprints_accepted(self):
        from text2human_tpu.cli.builders import build_trainer
        from text2human_tpu.cli.train import TrainLoop
        from text2human_tpu.config import parse

        opt = parse("configs/debug/vqvae_bottom_debug.yml", is_train=True)
        loop = TrainLoop(
            opt, build_trainer(opt), synthetic=False,
            token_meta={"synthetic": False},
        )
        loop._check_cache_checkpoints()  # no 'checkpoints' key: no-op

    def test_fingerprint_detects_tail_edits(self, tmp_path):
        """Multi-MiB files hash head+tail: an edit past the first MiB (e.g.
        fine-tuned weights, same header) must still change the fingerprint."""
        from text2human_tpu.data.token_cache import checkpoint_fingerprint

        big = tmp_path / "big.pth"
        data = bytearray(3 << 20)
        big.write_bytes(data)
        fp1 = checkpoint_fingerprint(str(big))
        data[-5] = 7  # tail edit, same size
        big.write_bytes(data)
        fp2 = checkpoint_fingerprint(str(big))
        assert fp1 != fp2

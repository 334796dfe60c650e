"""All-native training chain through the REAL CLIs (debug scale).

The hardware campaign (docs/CAMPAIGN.md) trains the tokenizers, builds a
token cache against those NATIVE orbax checkpoints, and trains the sampler
from it — no torch .pth anywhere.  This module drives that exact chain on
CPU at debug dims: cli/train.py --fixture for both tokenizers, then
cli/tokenize.py --fixture with ``img_ae_path``/``segm_ae_path`` pointing at
the checkpoint DIRECTORIES (utils/native_frozen.py), then sampler training
from the cache — including the checkpoint-fingerprint guard that must
reject a cache whose source checkpoint was re-trained.

Reference semantics being matched: the frozen-checkpoint loads of
transformer_model.py:100-121 driven from natively produced checkpoints
instead of the released .pth zoo.
"""

import json
import os
import os.path as osp

import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _isolated(isolated_root):
    """Every test runs in a tmp experiments root (conftest.isolated_root),
    so the chain's experiments/ + token_cache_debug/ land under tmp_path."""
    yield

SEGM_YML = """\
name: campaign_segm_debug
model_type: VQSegmentationModel
batch_size: 2
num_workers: 0
synthetic_length: 4
synthetic_resolution: 64
fixture_rich: true
embed_dim: 8
n_embed: 16
double_z: false
z_channels: 8
resolution: 64
in_channels: 24
out_ch: 24
ch: 8
ch_mult: [1, 1, 2]
num_res_blocks: 1
attn_resolutions: [16]
dropout: 0.0
num_segm_classes: 24
val_freq: 1
print_freq: 1
manual_seed: 0
num_epochs: 1
lr: 1.0e-4
lr_decay: step
gamma: 1.0
step: 50
"""

TOP_YML = """\
name: campaign_top_debug
model_type: VQImageSegmTextureModel
batch_size: 2
num_workers: 0
synthetic_length: 4
synthetic_resolution: 64
fixture_rich: true
embed_dim: 8
n_embed: 16
double_z: false
z_channels: 8
resolution: 64
in_channels: 3
out_ch: 3
ch: 8
ch_mult: [1, 1, 2]
num_res_blocks: 1
attn_resolutions: [16]
dropout: 0.0
disc_layers: 2
disc_weight_max: 1
disc_start_step: 0
ndf: 8
perceptual_weight: 1.0
diff_aug: true
num_segm_classes: 24
val_freq: 1
print_freq: 1
manual_seed: 0
num_epochs: 1
lr: 1.0e-4
lr_decay: step
gamma: 1.0
step: 50
"""

SAMPLER_YML = """\
name: campaign_sampler_debug
model_type: TransformerTextureAwareModel
batch_size: 2
num_workers: 0
synthetic_length: 4
synthetic_resolution: 64
fixture_rich: true
img_ae_path: ./experiments/campaign_top_debug/models/final
segm_ae_path: ./experiments/campaign_segm_debug/models/final
token_cache: ./token_cache_debug
img_embed_dim: 8
img_n_embed: 16
img_double_z: false
img_z_channels: 8
img_resolution: 64
img_in_channels: 3
img_out_ch: 3
img_ch: 8
img_ch_mult: [1, 1, 2]
img_num_res_blocks: 1
img_attn_resolutions: [16]
img_dropout: 0.0
segm_double_z: false
segm_z_channels: 8
segm_resolution: 64
segm_in_channels: 24
segm_out_ch: 24
segm_ch: 8
segm_ch_mult: [1, 1, 2]
segm_num_res_blocks: 1
segm_attn_resolutions: [16]
segm_dropout: 0.0
segm_num_segm_classes: 24
segm_n_embed: 16
segm_embed_dim: 8
codebook_size: 288
segm_codebook_size: 16
texture_codebook_size: 18
bert_n_emb: 16
bert_n_layers: 2
bert_n_head: 2
block_size: 128
latent_shape: [16, 8]
embd_pdrop: 0.0
resid_pdrop: 0.0
attn_pdrop: 0.0
num_head: 18
loss_type: reweighted_elbo
mask_schedule: random
sample_steps: 8
val_freq: 1
print_freq: 1
manual_seed: 0
num_epochs: 1
lr: 1.0e-4
lr_decay: step
gamma: 1.0
step: 50
"""


def _losses(exp_name):
    path = osp.join("experiments", exp_name, "metrics.jsonl")
    assert osp.exists(path), path
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_native_campaign_chain(tmp_path):
    cfg = {}
    for fname, text in (
        ("segm.yml", SEGM_YML), ("top.yml", TOP_YML), ("sampler.yml", SAMPLER_YML),
    ):
        (tmp_path / fname).write_text(text)
        cfg[fname] = str(tmp_path / fname)

    from text2human_tpu.cli import tokenize as tok_cli
    from text2human_tpu.cli import train as train_cli

    # 1-2. tokenizers, natively, on fixture data through the real CLI
    train_cli.main(["-opt", cfg["segm.yml"], "--fixture", "--max-iters", "2", "--cpu"])
    train_cli.main(["-opt", cfg["top.yml"], "--fixture", "--max-iters", "2", "--cpu"])
    for name in ("campaign_segm_debug", "campaign_top_debug"):
        final = osp.join("experiments", name, "models", "final")
        assert osp.isdir(final), final

    # 3. token cache built against the native checkpoint DIRECTORIES
    tok_cli.main(["-opt", cfg["sampler.yml"], "--fixture", "--out",
                  "token_cache_debug", "--batch-size", "2", "--cpu"])
    meta = json.load(open("token_cache_debug/train/meta.json"))
    assert meta["synthetic"] is False  # fixture cache has real-cache semantics
    fps = meta["checkpoints"]
    assert set(fps) == {"img_ae_path", "segm_ae_path"}
    for rec in fps.values():
        assert rec["sha256"] and rec["size"] > 0  # dir fingerprints recorded

    # 4. sampler trains FROM the cache with native frozen tokenizers; the
    # fingerprint check passes because the checkpoints are untouched
    train_cli.main(["-opt", cfg["sampler.yml"], "--fixture", "--max-iters", "2",
                    "--cpu"])
    logs = _losses("campaign_sampler_debug")
    assert logs and all(
        v == v for rec in logs for v in rec.values()
        if isinstance(v, float)
    )  # finite losses end to end

    # 5. the guard: a re-trained source checkpoint must be rejected
    victim = "experiments/campaign_top_debug/models/final"
    target = None
    for root, _dirs, files in os.walk(victim):
        for f in files:
            p = osp.join(root, f)
            if osp.getsize(p) > 0:
                target = p
                break
        if target:
            break
    assert target, f"no files under {victim}"
    with open(target, "r+b") as f:
        b = f.read(1)
        f.seek(0)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="different img_ae_path"):
        train_cli.main(["-opt", cfg["sampler.yml"], "--fixture", "--resume",
                        "--max-iters", "1", "--cpu"])

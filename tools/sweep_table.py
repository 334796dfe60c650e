"""Render campaign_logs/sweep_steps.json (cli/evaluate.py sweep-steps output)
as the BENCHMARKS.md quality-vs-steps markdown table, with a default-decode
recommendation derived from the data: the fastest schedule whose paired-L1
is within 10% and VGG-Frechet within 20% of the reference-faithful
absorbing:256 row.

Usage: python tools/sweep_table.py [campaign_logs/sweep_steps.json]
"""

import json
import sys


def render(path: str) -> str:
    with open(path) as f:
        data = json.load(f)
    rows = data["results"]
    ref = next(r for r in rows if r["decode"].startswith("absorbing"))
    out = [
        f"Quality vs decode schedule on the campaign-trained pipeline "
        f"(n={data['n']}, {data['resolution']}, held-out fixture parsings; "
        "paired metrics vs ground-truth renders):",
        "",
        "| decode | paired L1 | paired PSNR (dB) | VGG-Frechet | img/s |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        out.append(
            f"| {r['decode']} | {r['paired_l1']} | {r['paired_psnr_db']} "
            f"| {r['vgg_frechet']} | {r['imgs_per_s']} |"
        )
    best = ref
    for r in rows:
        if (
            r["paired_l1"] <= ref["paired_l1"] * 1.10
            and r["vgg_frechet"] <= ref["vgg_frechet"] * 1.20
            and r["imgs_per_s"] > best["imgs_per_s"]
        ):
            best = r
    out += [
        "",
        f"Recommended serving default: `{best['decode']}` — fastest schedule "
        f"within 10% paired-L1 / 20% VGG-Frechet of the reference-faithful "
        f"absorbing:256 ({best['imgs_per_s']} img/s vs {ref['imgs_per_s']}).",
    ]
    return "\n".join(out)


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "campaign_logs/sweep_steps.json"
    print(render(path))

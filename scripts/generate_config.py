#!/usr/bin/env python
"""Pair target videos with source images → swap-config YAML.

Capability parity with `/root/reference/REFace/generate_config.py:6-21`:
naturally-sorted video files/subdirs matched index-wise with source images.
"""

from __future__ import annotations

import argparse
import os
import re


def natsort_key(s: str):
    return [int(t) if t.isdigit() else t.lower() for t in re.split(r"(\d+)", s)]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--videos", required=True, help="dir of videos (.y4m) or frame subdirs")
    ap.add_argument("--sources", required=True, help="dir of source images")
    ap.add_argument("--out", default="swap_config.yaml")
    args = ap.parse_args()

    vids = sorted(
        (os.path.join(args.videos, v) for v in os.listdir(args.videos)),
        key=natsort_key,
    )
    srcs = sorted(
        (
            os.path.join(args.sources, s)
            for s in os.listdir(args.sources)
            if s.lower().endswith((".png", ".jpg", ".jpeg"))
        ),
        key=natsort_key,
    )
    with open(args.out, "w") as f:
        for v, s in zip(vids, srcs):
            f.write(f"- video: {v}\n  source: {s}\n")
    print(f"wrote {min(len(vids), len(srcs))} pairs to {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Regenerate the weather-Cityscapes metadata JSONs by scanning the dataset layout.

The reference's rain/fog/video metadata tables are missing from its public
checkout (SURVEY.md §2.12); this tool rebuilds them:

    python tools/make_metadata.py --root /data/.../weather_cityscapes --kind rain
    python tools/make_metadata.py --root ... --kind fog --out metadata_fog.json

Video tables (metadata_video.json / metadata_bern.json) cannot be derived
from the image-layout conventions above — their frame layout is
deployment-specific. Assemble them as a pandas DataFrame serialized with
`df.to_json(path)` with columns:

    image_path  relative PNG path
    label_path  relative labelIds path, or null for unlabeled frames
    set         "train" (video datasets are train-only streams)
    scene       the domain key ("source", "100mm_1", "clear", "video", ...)

(schema recoverable from the reference's surviving bern_video/metadata_bern.json;
`tests/synthetic.py::make_bern_dataset` builds a working example).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from onda_tpu.data.metadata import save_table, scan_weather_cityscapes  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="weather_cityscapes root directory")
    ap.add_argument("--kind", choices=["rain", "fog"], default="rain")
    ap.add_argument("--out", default=None, help="output JSON (default metadata[_fog].json in root)")
    ap.add_argument("--allow-unlabeled", action="store_true")
    args = ap.parse_args()
    table = scan_weather_cityscapes(args.root, args.kind, require_labels=not args.allow_unlabeled)
    out = args.out or os.path.join(
        args.root, "metadata.json" if args.kind == "rain" else "metadata_fog.json"
    )
    save_table(table, out)
    print(f"wrote {len(table)} rows to {out}")
    print(table.groupby(["set", "intensity"]).size())


if __name__ == "__main__":
    main()

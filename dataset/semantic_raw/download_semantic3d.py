#!/usr/bin/env python3
"""Download + extract the Semantic3D semantic-8 scenes.

Python equivalent of the reference's wget+7z shell script
(dataset/semantic_raw/download_semantic3d.sh), driven by the same URL
manifest (semantic3d_files.csv). Requires `7z` (p7zip) on PATH. Idempotent:
skips archives whose extracted .txt already exists.
"""

from __future__ import annotations

import os
import pathlib
import shutil
import subprocess
import sys
import urllib.request

HERE = pathlib.Path(__file__).resolve().parent
MANIFEST = HERE / "semantic3d_files.csv"


def main() -> int:
    if shutil.which("7z") is None:
        print("Please install p7zip (7z) first.", file=sys.stderr)
        return 1
    for url in MANIFEST.read_text().split():
        name = os.path.basename(url)
        txt_name = name.replace(".7z", "")
        if (HERE / txt_name).exists():
            print(f"{txt_name} exists, skipped")
            continue
        archive = HERE / name
        if not archive.exists():
            print(f"Downloading {name} ...")
            urllib.request.urlretrieve(url, archive)
        subprocess.run(["7z", "x", str(archive), "-y", f"-o{HERE}"], check=True)
    # The archive for neugasse extracts under a generic name; normalize it
    # (download_semantic3d.sh:17).
    generic = HERE / "station1_xyz_intensity_rgb.txt"
    target = HERE / "neugasse_station1_xyz_intensity_rgb.txt"
    if generic.exists() and not target.exists():
        generic.rename(target)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Download + extract KITTI raw drives (velodyne + calib).

Python equivalent of the reference's raw_data_downloader.sh. Downloads the
given drives of a date from the KITTI raw-data server and unzips them into
this directory (pykitti-compatible layout).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import urllib.request
import zipfile

HERE = pathlib.Path(__file__).resolve().parent
BASE_URL = "https://s3.eu-central-1.amazonaws.com/avg-kitti/raw_data"


def fetch(url: str, dest: pathlib.Path) -> None:
    if dest.exists():
        print(f"{dest.name} exists, skipped download")
        return
    print(f"Downloading {url} ...")
    urllib.request.urlretrieve(url, dest)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--date", default="2011_09_26")
    parser.add_argument("--drives", nargs="+", default=["0095"])
    flags = parser.parse_args()

    calib = f"{flags.date}_calib.zip"
    fetch(f"{BASE_URL}/{calib}", HERE / calib)
    with zipfile.ZipFile(HERE / calib) as z:
        z.extractall(HERE)

    for drive in flags.drives:
        stem = f"{flags.date}_drive_{drive}"
        name = f"{stem}_sync.zip"
        fetch(f"{BASE_URL}/{stem}/{name}", HERE / name)
        with zipfile.ZipFile(HERE / name) as z:
            z.extractall(HERE)
        print(f"extracted {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

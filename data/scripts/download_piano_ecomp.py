#!/usr/bin/env python
"""Downloads the International Piano-e-Competition MIDI dataset.

Capability parity with data/scripts/download_piano_ecomp.py in the reference:
scrapes the competition pages for ``.mid`` links and streams each file to the
output directory. Requires network access and the ``requests`` package.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path
from urllib.parse import urljoin

BASE_URL = "https://piano-e-competition.com"
YEAR_PAGES = [
    "/midi_2002.asp",
    "/midi_2004.asp",
    "/midi_2006.asp",
    "/midi_2008.asp",
    "/midi_2009.asp",
    "/midi_2011.asp",
    "/midi_2013.asp",
    "/midi_2014.asp",
    "/midi_2015.asp",
    "/midi_2017.asp",
    "/midi_2018.asp",
]

_MIDI_LINK = re.compile(r'href="([^"]+\.(?:mid|MID))"')


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("output", type=Path, help="Directory to download MIDI files into.")
    parser.add_argument("--chunk-size", type=int, default=32768)
    args = parser.parse_args()

    try:
        import requests
    except ImportError:
        print("The 'requests' package is required for downloading.", file=sys.stderr)
        return 1

    args.output.mkdir(parents=True, exist_ok=True)
    session = requests.Session()

    total = 0
    for page in YEAR_PAGES:
        page_url = urljoin(BASE_URL, page)
        try:
            response = session.get(page_url, timeout=30)
            response.raise_for_status()
        except Exception as error:
            print(f"skipping {page_url}: {error}", file=sys.stderr)
            continue

        for link in _MIDI_LINK.findall(response.text):
            file_url = urljoin(page_url, link)
            destination = args.output / Path(link).name
            if destination.exists():
                continue
            try:
                with session.get(file_url, stream=True, timeout=60) as download:
                    download.raise_for_status()
                    with open(destination, "wb") as handle:
                        for chunk in download.iter_content(chunk_size=args.chunk_size):
                            if chunk:
                                handle.write(chunk)
                total += 1
                print(f"downloaded {destination.name}")
            except Exception as error:
                print(f"failed {file_url}: {error}", file=sys.stderr)

    print(f"done: {total} files")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

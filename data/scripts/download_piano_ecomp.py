#!/usr/bin/env python
"""Downloads the International Piano-e-Competition MIDI dataset.

Capability parity with data/scripts/download_piano_ecomp.py in the reference:
scrapes the competition pages for ``.mid`` links and streams each file to the
output directory. Requires network access and the ``requests`` package.

The scrape/stream logic lives in :func:`download_all` so it can run against
any mirror (``--base-url``/``--pages``) — including the localhost fixture
server tests/test_downloader.py drives it with, since the real site is
unreachable from the build environment.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path
from typing import Iterable, Optional
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


def find_midi_links(html: str) -> list:
    """All ``.mid``/``.MID`` hrefs on a competition page, in page order."""
    return _MIDI_LINK.findall(html)


def download_all(
    output: Path,
    base_url: str = BASE_URL,
    pages: Iterable[str] = tuple(YEAR_PAGES),
    chunk_size: int = 32768,
    session=None,
    log=print,
) -> int:
    """Scrapes each page for MIDI links and streams new files to ``output``.

    Returns the number of files downloaded. Existing destination files are
    skipped (resume semantics); page fetch errors skip the page and file
    fetch errors skip the file, both without aborting the run.
    """
    import requests

    if session is None:
        session = requests.Session()
    output.mkdir(parents=True, exist_ok=True)

    total = 0
    for page in pages:
        page_url = urljoin(base_url, page)
        try:
            response = session.get(page_url, timeout=30)
            response.raise_for_status()
        except Exception as error:
            log(f"skipping {page_url}: {error}", file=sys.stderr)
            continue

        for link in find_midi_links(response.text):
            file_url = urljoin(page_url, link)
            destination = output / Path(link).name
            if destination.exists():
                continue
            try:
                with session.get(file_url, stream=True, timeout=60) as download:
                    download.raise_for_status()
                    with open(destination, "wb") as handle:
                        for chunk in download.iter_content(chunk_size=chunk_size):
                            if chunk:
                                handle.write(chunk)
                total += 1
                log(f"downloaded {destination.name}")
            except Exception as error:
                # Remove a partially streamed file so a re-run retries it
                # instead of resuming past truncated bytes.
                destination.unlink(missing_ok=True)
                log(f"failed {file_url}: {error}", file=sys.stderr)

    log(f"done: {total} files")
    return total


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("output", type=Path, help="Directory to download MIDI files into.")
    parser.add_argument("--chunk-size", type=int, default=32768)
    parser.add_argument("--base-url", default=BASE_URL,
                        help="Mirror root to scrape instead of the live site.")
    parser.add_argument("--pages", nargs="*", default=None,
                        help="Page paths to scrape (defaults to the year index pages).")
    args = parser.parse_args()

    try:
        import requests  # noqa: F401
    except ImportError:
        print("The 'requests' package is required for downloading.", file=sys.stderr)
        return 1

    download_all(
        args.output,
        base_url=args.base_url,
        pages=args.pages if args.pages is not None else YEAR_PAGES,
        chunk_size=args.chunk_size,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

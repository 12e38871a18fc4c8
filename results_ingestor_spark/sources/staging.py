"""Driver-side staging: HTTP download + ZIP extraction.

Parity with ingestor_precinct.py:70-107.  Spark has no HTTP source, so
(as in the reference) fetch and unzip are a driver-side pre-step that
stages files for the distributed CSV scan.  The 4096-byte streaming
chunk loop of the reference (ingestor_precinct.py:95) becomes
``shutil.copyfileobj`` with a larger buffer; progress is a callback.

At scale this step belongs in an external orchestrator fanning out to
object storage; the engine's contract is simply "a directory of files".
"""

from __future__ import annotations

import os
import shutil
import tempfile
import urllib.request
from collections.abc import Callable
from zipfile import ZipFile

CHUNK = 1 << 16


def download(url: str, dest_dir: str,
             progress: Callable[[int, int], None] | None = None) -> str:
    """Stream ``url`` into ``dest_dir``; returns the local file path."""
    filename = url.split("/")[-1] or "download"
    path = os.path.join(dest_dir, filename)
    with urllib.request.urlopen(url) as resp, open(path, "wb") as f:
        total = int(resp.headers.get("Content-Length") or 0)
        done = 0
        while True:
            chunk = resp.read(CHUNK)
            if not chunk:
                break
            f.write(chunk)
            done += len(chunk)
            if progress:
                progress(done, total)
    return path


def extract_if_zip(path: str) -> str:
    """If ``path`` ends with .zip: extract alongside, delete the archive
    (ingestor_precinct.py:102-107).  Returns the directory of data files."""
    d = os.path.dirname(path)
    if path.endswith(".zip"):
        with ZipFile(path) as z:
            z.extractall(d)
        os.remove(path)
    return d


def stage(url: str, dest_dir: str | None = None) -> str:
    """download + unzip → directory ready for read_result_files."""
    d = dest_dir or tempfile.mkdtemp(prefix="ingest_stage_")
    os.makedirs(d, exist_ok=True)
    return extract_if_zip(download(url, d))


def cleanup(staging_dir: str) -> None:
    shutil.rmtree(staging_dir, ignore_errors=True)

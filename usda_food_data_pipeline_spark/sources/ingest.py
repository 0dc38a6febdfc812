"""Driver-side ingest utilities (SURVEY §2.1 S1-S3).

The reference scrapes the USDA page with Selenium, regex-extracts the
zip URL, streams the download, extracts, and stages 4 CSVs
(usda_branded_food_data_pipeline.py:25-65,132-139). These are process
orchestration, not data ops — they stay outside the SparkSession, as
plain utilities feeding a landing directory that ``spark.read`` scans.
No Selenium: a plain HTTP fetch + regex covers the same contract.
"""

from __future__ import annotations

import os
import re
import shutil
import urllib.request
import zipfile

ZIP_URL_PATTERN = r'href="([^"]+\.zip)"'  # :32-34 regex-extract analog


def find_zip_url(page_html: str, pattern: str = ZIP_URL_PATTERN) -> str | None:
    m = re.search(pattern, page_html, re.DOTALL)
    return m.group(1) if m else None


def download(url: str, dest: str, chunk_size: int = 8192) -> str:
    """Streamed download in chunks (:37-42)."""
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with urllib.request.urlopen(url) as resp, open(dest, "wb") as out:
        while True:
            chunk = resp.read(chunk_size)
            if not chunk:
                break
            out.write(chunk)
    return dest


def extract_zip(zip_path: str, out_dir: str) -> list[str]:
    """:50-52."""
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(out_dir)
        return zf.namelist()


def stage_files(src_dir: str, dest_dir: str, keep: list[str]) -> list[str]:
    """Move the target files to the landing dir, drop the rest
    (:54-65,136-139)."""
    os.makedirs(dest_dir, exist_ok=True)
    staged = []
    for root, _dirs, files in os.walk(src_dir):
        for name in files:
            if name in keep:
                dst = os.path.join(dest_dir, name)
                shutil.move(os.path.join(root, name), dst)
                staged.append(dst)
    return staged

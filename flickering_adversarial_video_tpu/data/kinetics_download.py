"""Kinetics dataset acquisition (host tooling).

Rebuild of data/kinetics/download.py + process_download_report.py: crawl the
Kinetics CSV annotations (label, youtube_id, time_start, time_end, split),
fetch each clip with yt-dlp/youtube-dl, and trim+preprocess with ffmpeg using
the reference's exact filter — scale to 256 short-side then center-crop
224x224 AT DOWNLOAD TIME (download.py:105-114), which is why the tfrecord
writers can store raw 224x224 frames.  Parallel over a process pool; each
attempt is retried and logged to download_report.json; `summarize_report`
classifies failure reasons (process_download_report.py).

Both yt-dlp and ffmpeg are external binaries; this module degrades to a clear
error when they are absent (zero-egress environments).
"""

from __future__ import annotations

import csv
import json
import os
import shutil
import subprocess
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

FFMPEG_FILTER = "scale=256:256:force_original_aspect_ratio=increase,crop=224:224"


def _downloader_binary() -> Optional[str]:
    for name in ("yt-dlp", "youtube-dl"):
        if shutil.which(name):
            return name
    return None


def read_kinetics_csv(csv_path: str) -> List[Dict[str, str]]:
    """Rows with keys label, youtube_id, time_start, time_end, split."""
    with open(csv_path) as f:
        return list(csv.DictReader(f))


def download_clip(
    row: Dict[str, str],
    out_dir: str,
    *,
    retries: int = 5,
    crop: bool = True,
    timeout: int = 300,
) -> Tuple[str, str]:
    """Returns (youtube_id, status); status 'ok' or an error string."""
    ytid = row["youtube_id"]
    label = row["label"].replace(" ", "_")
    start = float(row["time_start"])
    end = float(row["time_end"])
    class_dir = os.path.join(out_dir, label)
    os.makedirs(class_dir, exist_ok=True)
    dest = os.path.join(class_dir, f"{ytid}.mp4")
    if os.path.exists(dest):
        return ytid, "ok"
    dl = _downloader_binary()
    if dl is None or shutil.which("ffmpeg") is None:
        return ytid, "missing yt-dlp/ffmpeg"

    tmp = dest + ".tmp.mp4"
    last_err = "unknown"
    for _ in range(retries):
        try:
            fetch = subprocess.run(
                [dl, "-f", "mp4", "-o", tmp, f"https://youtu.be/{ytid}"],
                capture_output=True,
                timeout=timeout,
                text=True,
            )
            if fetch.returncode != 0:
                last_err = (fetch.stderr or "download failed").strip().splitlines()[-1]
                continue
            cmd = [
                "ffmpeg", "-y", "-ss", str(start), "-to", str(end), "-i", tmp,
            ]
            if crop:
                cmd += ["-vf", FFMPEG_FILTER]
            cmd += ["-c:v", "libx264", "-an", dest]
            trim = subprocess.run(cmd, capture_output=True, timeout=timeout, text=True)
            if trim.returncode == 0:
                return ytid, "ok"
            last_err = (trim.stderr or "ffmpeg failed").strip().splitlines()[-1]
        except subprocess.TimeoutExpired:
            last_err = "timeout"
        except Exception as e:  # noqa: BLE001 — report, don't crash the crawl
            last_err = str(e)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    return ytid, last_err


def download_dataset(
    csv_path: str,
    out_dir: str,
    *,
    jobs: int = 8,
    limit: Optional[int] = None,
    report_path: Optional[str] = None,
) -> Dict[str, str]:
    rows = read_kinetics_csv(csv_path)[:limit]
    report: Dict[str, str] = {}
    with ThreadPoolExecutor(max_workers=jobs) as ex:
        for ytid, status in ex.map(lambda r: download_clip(r, out_dir), rows):
            report[ytid] = status
    report_path = report_path or os.path.join(out_dir, "download_report.json")
    os.makedirs(os.path.dirname(report_path), exist_ok=True)
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1)
    return report


def summarize_report(report_path: str) -> Dict[str, int]:
    """Failure-reason histogram (process_download_report.py equivalent)."""
    with open(report_path) as f:
        report = json.load(f)
    summary: Dict[str, int] = {}
    for status in report.values():
        key = "ok" if status == "ok" else (
            "unavailable" if "unavailable" in status.lower()
            else "copyright" if "copyright" in status.lower()
            else "timeout" if status == "timeout"
            else "missing tools" if "missing" in status
            else "other"
        )
        summary[key] = summary.get(key, 0) + 1
    return summary


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("csv", help="kinetics annotation csv")
    p.add_argument("out_dir")
    p.add_argument("--jobs", type=int, default=8)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)
    report = download_dataset(args.csv, args.out_dir, jobs=args.jobs, limit=args.limit)
    print(json.dumps(summarize_report(os.path.join(args.out_dir, "download_report.json")), indent=1))


if __name__ == "__main__":
    main()

"""Fetch the published pretrained Chainer predictors from figshare.

The reference notebook (illusion_generation.ipynb cell 9) consumes two
externally-hosted Chainer PredNet snapshots:

  * color:     ``fpsi_500000_20v.model`` — figshare article 11931222
               ("Sample Weight Model Front Psychol 15 March 2018")
  * grayscale: ``300000_wb.model``       — doi:10.6084/m9.figshare.13280120
               (figshare article 13280120)

This script resolves each article through the public figshare API
(https://api.figshare.com/v2/articles/<id>), downloads the .model files
into ``models/`` (or ``--out``), and prints each file's SHA-256 so the
checksum table below can be pinned after a first verified fetch.  It fails
gracefully (exit 2, actionable message) when the network is unreachable —
this environment has zero egress, so the script is the *readiness* path:
on any networked machine one command stands between a checkout and a
real-weights probe run:

    python scripts/fetch_models.py
    python scripts/probe_rated.py \
        --model_bw models/300000_wb.model \
        --model_color models/fpsi_500000_20v.model

Import the downloaded snapshots with
``load_chainer_model(path, channels, half_order="auto")`` — the E-unit
half-order convention of the published training code is detected
empirically (models/prednet/loader.py).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import urllib.error
import urllib.request

API = "https://api.figshare.com/v2/articles/{id}"

MODELS = {
    "fpsi_500000_20v.model": {
        "article": 11931222,
        "channels": "3,48,96,192",
        # pin after the first verified fetch (script prints the digest)
        "sha256": None,
    },
    "300000_wb.model": {
        "article": 13280120,
        "channels": "1,16,32,64",
        "sha256": None,
    },
}

#: Sidecar pin file, written automatically after the first VERIFIED fetch
#: (md5 matched figshare's supplied_md5).  Commit it to make the pin
#: permanent; entries here override the (None) pins in MODELS.
PINS_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "model_checksums.json")


def load_pins(pins_file: str = PINS_FILE) -> dict:
    if os.path.exists(pins_file):
        with open(pins_file) as f:
            return json.load(f)
    return {}


def save_pin(name: str, sha256: str, md5: str,
             pins_file: str = PINS_FILE) -> None:
    pins = load_pins(pins_file)
    pins[name] = {"sha256": sha256, "md5": md5}
    with open(pins_file, "w") as f:
        json.dump(pins, f, indent=2, sort_keys=True)
        f.write("\n")


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def md5_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def resolve_files(article_id: int, timeout: float):
    """figshare article -> [{name, download_url, size, supplied_md5}]."""
    with urllib.request.urlopen(API.format(id=article_id), timeout=timeout) as r:
        meta = json.load(r)
    return meta.get("files", [])


def fetch(url: str, dest: str, timeout: float) -> None:
    tmp = dest + ".part"
    with urllib.request.urlopen(url, timeout=timeout) as r, open(tmp, "wb") as f:
        while True:
            b = r.read(1 << 20)
            if not b:
                break
            f.write(b)
    os.replace(tmp, dest)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default="models", help="download directory")
    p.add_argument("--timeout", type=float, default=60.0)
    p.add_argument("--force", action="store_true",
                   help="re-download even if the file exists")
    p.add_argument("--pins", default=PINS_FILE,
                   help="checksum pin file (written after first verified "
                        "fetch, read on every run)")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    pins = load_pins(args.pins)
    failures = 0
    for name, spec in MODELS.items():
        pinned_sha = pins.get(name, {}).get("sha256") or spec["sha256"]
        dest = os.path.join(args.out, name)
        if os.path.exists(dest) and not args.force:
            digest = sha256_file(dest)
            status = "ok"
            if pinned_sha and digest != pinned_sha:
                status = "CHECKSUM MISMATCH"
                failures += 1
            print(f"[fetch] {name}: exists, sha256={digest} ({status})")
            continue
        try:
            files = resolve_files(spec["article"], args.timeout)
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            print(
                f"[fetch] {name}: cannot reach figshare article "
                f"{spec['article']} ({e}). Offline? Download manually from "
                f"https://figshare.com/articles/{spec['article']} and place "
                f"it at {dest}.",
                file=sys.stderr,
            )
            failures += 1
            continue
        match = next(
            (f for f in files if f.get("name") == name), files[0] if files else None
        )
        if match is None:
            print(
                f"[fetch] {name}: article {spec['article']} lists no files",
                file=sys.stderr,
            )
            failures += 1
            continue
        try:
            fetch(match["download_url"], dest, args.timeout)
        except (urllib.error.URLError, OSError, TimeoutError, KeyError) as e:
            print(f"[fetch] {name}: download failed ({e})", file=sys.stderr)
            failures += 1
            continue
        digest = sha256_file(dest)
        if pinned_sha and digest != pinned_sha:
            print(
                f"[fetch] {name}: sha256 {digest} != pinned {pinned_sha}",
                file=sys.stderr,
            )
            failures += 1
            continue
        # integrity on FIRST fetch: figshare's API supplies the md5 it
        # computed at upload time — verify before self-pinning
        supplied = match.get("supplied_md5") or match.get("computed_md5")
        got_md5 = md5_file(dest)
        if supplied and got_md5 != supplied:
            print(
                f"[fetch] {name}: md5 {got_md5} != figshare's "
                f"supplied_md5 {supplied} — corrupt download",
                file=sys.stderr,
            )
            failures += 1
            continue
        if not pinned_sha:
            save_pin(name, digest, got_md5, args.pins)
            pin = (f"  (pinned -> {os.path.basename(args.pins)}; commit it "
                   f"to make permanent)")
        else:
            pin = ""
        print(f"[fetch] {name}: downloaded, sha256={digest}{pin}")
        print(f"[fetch]   import: load_chainer_model({dest!r}, "
              f"({spec['channels']}), half_order='auto')")
    return 2 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

"""Index deployment: throttled, manifest-verified snapshot copy.

Reference: Katta nodes INSTALL shards by copying the immutable index
files from shared storage to local disk through a bandwidth throttle
(node/ShardManager.java:45-73 installShard with a ThrottleSemaphore;
util/ThrottledInputStream.java:48- the rate-limited stream; the
node-level throttle knob in util/NodeConfiguration.java), deleting the
half-copied folder on failure (ShardManager.java:70). katta_spark
indexes are the same kind of immutable directory snapshot, so deploy is
the same operation: copy every file, pace reads against a byte budget
so deploys don't starve serving traffic, verify content, and never
leave a half-copied directory looking installed.

- :func:`index_manifest` — per-file (size, sha256) of an index dir; the
  content identity of a snapshot.
- :func:`copy_index` — throttled recursive copy into a fresh directory.
  Data lands in ``dst + ".part"`` and is atomically renamed on success
  (the ShardManager delete-on-failure contract, strengthened to
  never-visible); with ``verify=True`` the copy re-hashes the
  destination and refuses to commit on any mismatch.
- :func:`verify_index` — re-hash a directory against a manifest
  (deploy-time integrity check, or later bit-rot audit).

The throttle is a token bucket over wall time (read a chunk, sleep
until the byte budget catches up) — the per-stream behavior of
ThrottledInputStream. Driver-side by design: deploy copies are a
control-plane action like Katta's node install, not a Spark job.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

_CHUNK = 1 << 20


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        while True:
            b = fh.read(_CHUNK)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def index_manifest(index_dir: str) -> dict:
    """{relpath: [size, sha256]} over every file of the index snapshot."""
    if not os.path.exists(os.path.join(index_dir, "FORMAT_VERSION")):
        raise ValueError(
            f"{index_dir!r} has no FORMAT_VERSION marker — not an index"
        )
    out: dict[str, list] = {}
    for root, _, files in os.walk(index_dir):
        for f in sorted(files):
            full = os.path.join(root, f)
            rel = os.path.relpath(full, index_dir)
            out[rel] = [os.path.getsize(full), _sha256(full)]
    return out


def verify_index(index_dir: str, manifest: dict) -> dict:
    """Re-hash ``index_dir`` against ``manifest``. Returns
    {"ok": bool, "missing": [...], "mismatched": [...], "extra": [...]}."""
    missing, mismatched = [], []
    seen = set()
    for rel, (size, digest) in manifest.items():
        full = os.path.join(index_dir, rel)
        seen.add(rel)
        if not os.path.exists(full):
            missing.append(rel)
        elif os.path.getsize(full) != size or _sha256(full) != digest:
            mismatched.append(rel)
    extra = [
        os.path.relpath(os.path.join(root, f), index_dir)
        for root, _, files in os.walk(index_dir)
        for f in files
        if os.path.relpath(os.path.join(root, f), index_dir) not in seen
    ]
    return {
        "ok": not (missing or mismatched or extra),
        "missing": sorted(missing),
        "mismatched": sorted(mismatched),
        "extra": sorted(extra),
    }


def copy_index(
    src: str,
    dst: str,
    max_bytes_per_sec: float | None = None,
    verify: bool = True,
) -> dict:
    """Deploy the index snapshot at ``src`` to ``dst``.

    Copies through ``dst + '.part'`` and renames atomically — a crashed
    or failed deploy is never mistaken for an installed index. With a
    rate cap, reads pace themselves against the byte budget
    (ThrottledInputStream semantics). Returns {"files", "bytes",
    "seconds", "bytes_per_sec", "verified"}.
    """
    if max_bytes_per_sec is not None and max_bytes_per_sec <= 0:
        raise ValueError("max_bytes_per_sec must be > 0")
    manifest = index_manifest(src)  # also validates src IS an index
    if os.path.exists(dst) and os.listdir(dst):
        raise ValueError(f"{dst!r} exists and is not empty")
    part = dst + ".part"
    if os.path.exists(part):
        shutil.rmtree(part)  # half-copied leftover from a crashed deploy

    t0 = time.monotonic()
    copied = 0
    try:
        for rel in manifest:
            out = os.path.join(part, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(os.path.join(src, rel), "rb") as fi, \
                    open(out, "wb") as fo:
                while True:
                    b = fi.read(_CHUNK)
                    if not b:
                        break
                    fo.write(b)
                    copied += len(b)
                    if max_bytes_per_sec is not None:
                        # token bucket: sleep until the budget catches up
                        ahead = copied / max_bytes_per_sec - (
                            time.monotonic() - t0
                        )
                        if ahead > 0:
                            time.sleep(ahead)
        if verify:
            report = verify_index(part, manifest)
            if not report["ok"]:
                raise IOError(f"deploy verification failed: {report}")
    except BaseException:
        shutil.rmtree(part, ignore_errors=True)
        raise
    os.rename(part, dst)  # commit
    elapsed = time.monotonic() - t0
    return {
        "files": len(manifest),
        "bytes": copied,
        "seconds": round(elapsed, 3),
        "bytes_per_sec": round(copied / elapsed, 1) if elapsed else None,
        "verified": bool(verify),
    }

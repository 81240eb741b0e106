#!/usr/bin/env python
"""CLI: walk SlowFast/ResNet feature trees → ``video_feat_info.pkl``
(reference ``scripts/collect_video_feature_paths.py:13-96``).

Recursively scans ``{feature_dir}/slowfast_features`` for ``<vid>.npz``,
pairs each with the same relative path under
``{feature_dir}/resnet_features``, validates both npz files in a process
pool, and writes ``{output}/{dataset}/video_feat_info.pkl`` mapping
``vid -> (frame_len, slowfast_path, resnet_path, folder)`` — the exact
schema the reference's ``convert_videodb.py`` consumes, so pkl files are
interchangeable between the two stacks.  Missing/corrupted files get ""
paths and are listed in ``failed_{slowfast,resnet}_files.pkl``.
"""

import argparse
import multiprocessing as mp
import os
import pickle
import sys

import numpy as np


def _npz_frame_len(path: str) -> int:
    """Rows in the npz 'features' array; 0 when unreadable/corrupted."""
    try:
        with np.load(path, allow_pickle=True) as z:
            return max(0, len(z["features"]))
    except Exception:
        return 0


def validate_pair(job):
    """(vid, sf_path, rn_path, folder) -> reference record tuple."""
    vid, sf_path, rn_path, folder = job
    sf_len = _npz_frame_len(sf_path)
    if sf_len == 0:
        sf_path = ""
    rn_len = _npz_frame_len(rn_path) if os.path.exists(rn_path) else 0
    if rn_len == 0:
        rn_path = ""
    return vid, min(sf_len, rn_len), sf_path, rn_path, folder


def collect(feature_dir: str, nproc: int = 10):
    """Scan + validate; returns (files, failed_slowfast, failed_resnet)."""
    slowfast_dir = os.path.join(feature_dir, "slowfast_features")
    resnet_dir = os.path.join(feature_dir, "resnet_features")
    jobs = []
    for root, _, names in os.walk(slowfast_dir):
        for name in names:
            if not name.endswith(".npz"):
                continue
            sf_path = os.path.join(root, name)
            vid = name[:-len(".npz")]
            folder = os.path.basename(root)
            rn_path = os.path.join(resnet_dir,
                                   os.path.relpath(sf_path, slowfast_dir))
            jobs.append((vid, sf_path, rn_path, folder))
    print(f"found {len(jobs)} slowfast files under {slowfast_dir}",
          file=sys.stderr)

    files, failed_sf, failed_rn = {}, [], []
    if nproc > 1 and len(jobs) > 1:
        with mp.Pool(nproc) as pool:
            results = pool.imap_unordered(validate_pair, jobs,
                                          chunksize=128)
            results = list(results)
    else:
        results = [validate_pair(j) for j in jobs]
    for vid, frame_len, sf_path, rn_path, folder in results:
        files[vid] = (frame_len, sf_path, rn_path, folder)
        if sf_path == "":
            failed_sf.append(os.path.join(folder, vid))
        if rn_path == "":
            failed_rn.append(os.path.join(folder, vid))
    return files, failed_sf, failed_rn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--feature_dir", required=True,
                   help="dir holding slowfast_features/ + resnet_features/")
    p.add_argument("--output", required=True)
    p.add_argument("--dataset", default="")
    p.add_argument("--nproc", type=int, default=10)
    args = p.parse_args()

    files, failed_sf, failed_rn = collect(args.feature_dir, args.nproc)
    out_dir = os.path.join(args.output, args.dataset)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "video_feat_info.pkl"), "wb") as f:
        pickle.dump(files, f)
    for name, failed in (("failed_slowfast_files.pkl", failed_sf),
                         ("failed_resnet_files.pkl", failed_rn)):
        if failed:
            with open(os.path.join(out_dir, name), "wb") as f:
                pickle.dump(failed, f)
    print(f"wrote {len(files)} records "
          f"({len(failed_sf)} slowfast / {len(failed_rn)} resnet failures)")


if __name__ == "__main__":
    main()

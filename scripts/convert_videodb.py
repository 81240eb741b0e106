#!/usr/bin/env python
"""CLI: SlowFast+ResNet npz dirs → video-feature herostore
(reference scripts/collect_video_feature_paths.py + convert_videodb.py).

Walks --slowfast_dir/--resnet_dir for <vid>.npz pairs, concatenates
per-frame features to 4352-d float16, writes the db + id2nframe.json.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, ".")

from hero_tpu.prepro.build_dbs import build_video_db


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--slowfast_dir")
    p.add_argument("--resnet_dir")
    p.add_argument("--feat_info",
                   help="video_feat_info.pkl from "
                        "collect_video_feature_paths.py (either stack's "
                        "output — same schema); overrides the dir scan")
    p.add_argument("--output", required=True)
    p.add_argument("--clip_interval", default=-1, type=float,
                   help=">0 splits videos into fixed-second clips "
                        "(HowTo100M rule)")
    p.add_argument("--frame_length", default=1.5, type=float)
    args = p.parse_args()

    vid2paths = {}
    if args.feat_info:
        import pickle
        with open(args.feat_info, "rb") as f:
            info = pickle.load(f)
        # {vid: (frame_len, slowfast_path, resnet_path, folder)}; ""
        # marks a failed file — skip those records
        for vid, (_, sf, rn, _folder) in info.items():
            if sf and rn:
                vid2paths[vid] = {"slowfast": sf, "resnet": rn}
    elif not (args.slowfast_dir and args.resnet_dir):
        p.error("need --feat_info or both --slowfast_dir/--resnet_dir")
    else:
        for path in glob.glob(os.path.join(args.slowfast_dir, "*.npz")):
            vid = os.path.splitext(os.path.basename(path))[0]
            rn = os.path.join(args.resnet_dir, f"{vid}.npz")
            if os.path.exists(rn):
                vid2paths[vid] = {"slowfast": path, "resnet": rn}
    corrupted = build_video_db(args.output, vid2paths,
                               clip_interval=args.clip_interval,
                               frame_length=args.frame_length)
    print(f"converted {len(vid2paths) - len(corrupted)} videos "
          f"({len(corrupted)} corrupted)")


if __name__ == "__main__":
    main()

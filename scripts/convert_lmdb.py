#!/usr/bin/env python
"""CLI: convert a reference LMDB db (HERO release format) → herostore.

Requires the ``lmdb`` (and, for compressed dbs, ``lz4``/``msgpack``)
python packages — present in the reference's docker image, absent here by
design; run this where those are installed.  Sidecar JSONs are copied
unchanged.
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lmdb_dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--kind", default="txt", choices=["txt", "vfeat"],
                   help="txt: msgpack values; vfeat: numpy feature arrays")
    p.add_argument("--compress", action="store_true",
                   help="source db stores lz4-framed npz (HowTo100M)")
    args = p.parse_args()

    try:
        import lmdb
        import msgpack
        import msgpack_numpy
        msgpack_numpy.patch()
    except ImportError as e:
        raise SystemExit(
            f"convert_lmdb needs the lmdb/msgpack_numpy packages: {e}")

    import numpy as np
    from hero_tpu.data.store import HeroStoreWriter

    env = lmdb.open(args.lmdb_dir, readonly=True, create=False,
                    max_readers=4096 * 8, readahead=False)
    txn = env.begin(buffers=True)
    n = 0
    with HeroStoreWriter(args.output) as w:
        with txn.cursor() as cur:
            for key, value in cur:
                k = bytes(key).decode()
                if args.compress:
                    import lz4.frame
                    with np.load(__import__("io").BytesIO(
                            lz4.frame.decompress(bytes(value))),
                            allow_pickle=True) as z:
                        v = z["features"]
                elif args.kind == "vfeat":
                    v = msgpack.loads(bytes(value), raw=False)
                else:
                    import lz4.frame
                    v = msgpack.loads(lz4.frame.decompress(bytes(value)),
                                      raw=False)
                w.put(k, v)
                n += 1
    for name in os.listdir(args.lmdb_dir):
        if name.endswith(".json") or name.endswith(".jsonl"):
            shutil.copy(os.path.join(args.lmdb_dir, name),
                        os.path.join(args.output, name))
    print(f"converted {n} records from {args.lmdb_dir} → {args.output}")


if __name__ == "__main__":
    main()

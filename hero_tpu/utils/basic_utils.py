"""Small IO helpers (reference ``utils/basic_utils.py``)."""

from __future__ import annotations

import json
import os
import pickle
import zipfile
from typing import Any, Iterable, List


def load_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def save_json(data: Any, path: str, save_pretty: bool = False,
              sort_keys: bool = False) -> None:
    with open(path, "w") as f:
        if save_pretty:
            f.write(json.dumps(data, indent=4, sort_keys=sort_keys))
        else:
            json.dump(data, f, sort_keys=sort_keys)


def load_jsonl(path: str) -> List[Any]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def save_jsonl(data: Iterable[Any], path: str) -> None:
    with open(path, "w") as f:
        f.write("\n".join(json.dumps(e) for e in data))


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(data: Any, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)


def dissect_by_lengths(np_array, lengths, dim: int = 0,
                       assert_equal: bool = True):
    """Split an array into a list of chunks with the given lengths."""
    if assert_equal:
        assert np_array.shape[dim] == sum(lengths)
    out, offset = [], 0
    for n in lengths:
        if dim == 0:
            out.append(np_array[offset:offset + n])
        elif dim == 1:
            out.append(np_array[:, offset:offset + n])
        else:
            raise NotImplementedError
        offset += n
    return out


def get_show_name(vid_name: str) -> str:
    """TVR vid format: {show}_{season}_..."""
    show_list = ["friends", "met", "castle", "house", "grey"]
    vid_name_prefix = vid_name.split("_")[0]
    return vid_name_prefix if vid_name_prefix in show_list else "bbt"


def make_zipfile(src_dir: str, save_path: str,
                 enclosing_dir: str = "",
                 exclude_dirs=(), exclude_extensions=(),
                 exclude_dirs_substring=None) -> None:
    """Zip a source tree (used to snapshot the code when git is absent)."""
    abs_src = os.path.abspath(src_dir)
    with zipfile.ZipFile(save_path, "w") as zf:
        for dirname, subdirs, files in os.walk(src_dir):
            if exclude_dirs_substring is not None and \
                    exclude_dirs_substring in dirname:
                continue
            subdirs[:] = [d for d in subdirs if d not in exclude_dirs]
            arcname = os.path.join(enclosing_dir,
                                   dirname[len(abs_src) + 1:])
            zf.write(dirname, arcname)
            for filename in files:
                if os.path.splitext(filename)[1] in exclude_extensions:
                    continue
                zf.write(os.path.join(dirname, filename),
                         os.path.join(arcname, filename))

"""Offline FID CLI: folder vs folder.

TPU-native rewrite of the reference's offline clean-fid CLI
(`eval/cal_cleanfid.py`, SURVEY.md §2.9 "misc"):

  python -m sgdm_tpu.eval.fid_cli DIR1 DIR2 [--debug] [--max-items N]
"""

from __future__ import annotations

import argparse
import json

from .fid_engine import InceptionExtractor, get_fid_dict


def main() -> None:
    p = argparse.ArgumentParser(description="FID between two image folders")
    p.add_argument("dir1", help="sample dir")
    p.add_argument("dir2", help="reference dir")
    p.add_argument("--debug", action="store_true",
                   help="skip the torch-fidelity-flavored extras")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--weights", default=None,
                   help="pt_inception .pth (else SGDM_INCEPTION_WEIGHTS)")
    a = p.parse_args()
    ex = InceptionExtractor(weights_path=a.weights, batch_size=a.batch_size)
    out, fid = get_fid_dict(a.dir1, a.dir2, ex, debug=a.debug)
    print(json.dumps({"fid": fid, **out}, indent=2))


if __name__ == "__main__":
    main()

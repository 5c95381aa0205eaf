#!/usr/bin/env python
"""Print the fully-merged config (reference ``tools/misc/print_config.py``)."""
import argparse
import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()

    from boosting_rcnn_tpu.config import load_config

    cfg = load_config(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    pprint.pprint(cfg.to_dict(), width=100)


if __name__ == "__main__":
    main()

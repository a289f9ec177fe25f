#!/usr/bin/env python
"""Print the fully-merged config (the reference tools/misc/print_config.py)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from stereoscene_tpu.config import load_config


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    args = p.parse_args()
    cfg = load_config(args.config)
    print(json.dumps(cfg, indent=2, default=str))


if __name__ == "__main__":
    main()

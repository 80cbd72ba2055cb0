"""Build the tacotron HDF5 feature cache.

Equivalent of `python tacotron/prepare.py dataset/ config.yaml --data cache.h5`
(/root/reference/tacotron/prepare.py).
"""

from __future__ import annotations

import argparse
import logging


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", help="dataset dir (transcript + wavs)")
    p.add_argument("config", help="tacotron config YAML")
    p.add_argument("--data", required=True, help="output HDF5 path")
    p.add_argument("--transcript", default="metadata.csv")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)

    from torch_tts_tpu.core.config import load_tacotron_config
    from torch_tts_tpu.data.tacotron_dataset import build_dataset_hdf5

    cfg = load_tacotron_config(args.config)
    build_dataset_hdf5(args.dataset, cfg, args.data, args.transcript)
    print(f"wrote {args.data}")


if __name__ == "__main__":
    main()

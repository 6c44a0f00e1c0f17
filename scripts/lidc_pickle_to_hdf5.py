#!/usr/bin/env python
"""One-off LIDC data converter: the public pickle release -> data_lidc.hdf5.

Parity: `process_data` (`datasets/lidc.py:35-92`) — reads the pickled dict of
`{key: {'image', 'masks' (4x128x128), 'series_uid'}}`, splits subjects
80/20 train+val/test then 80/20 train/val (by unique series uid), and writes
`train/val/test` groups with `images` (float, shifted by -0.5), `labels`
(uint8 [N,4,128,128]) and `uids` datasets.

Usage: python scripts/lidc_pickle_to_hdf5.py data_lidc.pickle data_lidc.hdf5 [--seed 0]
"""

import argparse
import pickle

import h5py
import numpy as np


def split_subjects(uids, seed: int):
    rng = np.random.default_rng(seed)
    unique = np.unique(uids)
    perm = rng.permutation(unique)
    n_test = int(round(0.2 * len(unique)))
    test = set(perm[:n_test])
    rest = perm[n_test:]
    n_val = int(round(0.2 * len(rest)))
    val = set(rest[:n_val])
    train = set(rest[n_val:])
    return train, val, test


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pickle_file")
    ap.add_argument("out_hdf5")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    with open(args.pickle_file, "rb") as f:
        data = pickle.load(f)

    series = [v["series_uid"] for v in data.values()]
    train, val, test = split_subjects(series, args.seed)

    buckets = {"train": ([], [], []), "val": ([], [], []), "test": ([], [], [])}
    for value in data.values():
        sid = value["series_uid"]
        split = "train" if sid in train else ("val" if sid in val else "test")
        imgs, lbls, uids = buckets[split]
        imgs.append(np.asarray(value["image"], dtype=np.float64) - 0.5)
        lbls.append(np.asarray(value["masks"], dtype=np.uint8))
        uids.append(hash(sid) % (2 ** 63))

    with h5py.File(args.out_hdf5, "w") as f:
        for split, (imgs, lbls, uids) in buckets.items():
            g = f.create_group(split)
            g.create_dataset("images", data=np.asarray(imgs))
            g.create_dataset("labels", data=np.asarray(lbls))
            g.create_dataset("uids", data=np.asarray(uids, dtype=np.int64))
            print(f"{split}: {len(imgs)} slices")
    print(f"wrote {args.out_hdf5}")


if __name__ == "__main__":
    main()

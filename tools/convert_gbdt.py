#!/usr/bin/env python3
"""One-time conversion of the reference's embedded GBDT regressors
(trained-model DATA, reference: src/model.rs) into dense tensors for the
fused gather/where readout in skani_tpu/gbdt.py.

Output: skani_tpu/models/gbdt_c125.npz, gbdt_c200.npz with per-tree padded
node arrays (feature_index, threshold, left, right, is_leaf, pred) + scalars
(bias, shrinkage, n_trees, max_depth).
"""
import json
import re
import sys

import numpy as np


def convert(model: dict, out_path: str) -> None:
    trees = model["trees"]
    n_trees = len(trees)
    max_nodes = max(len(t["tree"]["tree"]) for t in trees)
    feat = np.zeros((n_trees, max_nodes), dtype=np.int32)
    thr = np.zeros((n_trees, max_nodes), dtype=np.float32)
    left = np.zeros((n_trees, max_nodes), dtype=np.int32)
    right = np.zeros((n_trees, max_nodes), dtype=np.int32)
    leaf = np.zeros((n_trees, max_nodes), dtype=bool)
    pred = np.zeros((n_trees, max_nodes), dtype=np.float32)
    for ti, t in enumerate(trees):
        nodes = t["tree"]["tree"]
        for node in nodes:
            i = node["index"]
            v = node["value"]
            feat[ti, i] = v["feature_index"]
            thr[ti, i] = np.float32(v["feature_value"])
            left[ti, i] = node["left"]
            right[ti, i] = node["right"]
            leaf[ti, i] = v["is_leaf"]
            pred[ti, i] = np.float32(v["pred"])
    np.savez_compressed(
        out_path,
        feature_index=feat, threshold=thr, left=left, right=right,
        is_leaf=leaf, pred=pred,
        bias=np.float32(model["bias"]),
        shrinkage=np.float32(model["conf"]["shrinkage"]),
        n_trees=np.int32(n_trees),
        max_depth=np.int32(model["conf"]["max_depth"]),
    )
    print(f"wrote {out_path}: {n_trees} trees, <= {max_nodes} nodes, "
          f"bias {model['bias']}, shrinkage {model['conf']['shrinkage']}")


def main():
    src = open(sys.argv[1] if len(sys.argv) > 1
               else "/root/reference/src/model.rs").read()
    parts = re.findall(r'r#"(.*?)"#', src, re.S)
    assert len(parts) == 2
    convert(json.loads(parts[0]), "skani_tpu/models/gbdt_c125.npz")
    convert(json.loads(parts[1]), "skani_tpu/models/gbdt_c200.npz")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Hierarchically clustered heatmap of a `skani-tpu triangle` matrix.

Offline plotting utility, equivalent in role to the reference's
scripts/clustermap_triangle.py (seaborn/scipy clustermap over a PHYLIP-style
ANI matrix).

Usage: python scripts/clustermap_triangle.py skani_matrix.txt [out.png]
"""
import sys

import numpy as np


def read_phylip(path):
    with open(path) as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]
    n = int(lines[0])
    names = []
    mat = np.zeros((n, n))
    for i, line in enumerate(lines[1:n + 1]):
        parts = line.split("\t")
        names.append(parts[0])
        vals = [float(x) for x in parts[1:]]
        for j, v in enumerate(vals):
            mat[i, j] = v
            mat[j, i] = v
        mat[i, i] = 100.0
    return names, mat


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "skani_clustermap.png"
    names, mat = read_phylip(path)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import scipy.cluster.hierarchy as sch
        import matplotlib.pyplot as plt
    except ImportError:
        sys.exit("matplotlib/scipy required for plotting")
    dist = 100.0 - mat
    link = sch.linkage(dist[np.triu_indices_from(dist, 1)], method="average")
    order = sch.leaves_list(link)
    m = mat[np.ix_(order, order)]
    fig, ax = plt.subplots(figsize=(10, 9))
    im = ax.imshow(m, cmap="viridis")
    ax.set_xticks(range(len(names)))
    ax.set_yticks(range(len(names)))
    ax.set_xticklabels([names[i] for i in order], rotation=90, fontsize=6)
    ax.set_yticklabels([names[i] for i in order], fontsize=6)
    fig.colorbar(im, label="ANI (%)")
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

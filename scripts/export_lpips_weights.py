"""Export torchvision VGG16 + LPIPS linear-head weights to an .npz for
pings_tpu.eval.lpips (run on any machine WITH network access; this
zero-egress host cannot download them).

Usage:
    pip install torch torchvision lpips
    python scripts/export_lpips_weights.py lpips_vgg16.npz
    # then on the target host:
    export PINGS_LPIPS_WEIGHTS=/path/to/lpips_vgg16.npz
"""

import sys

import numpy as np


def main(out_path: str):
    import lpips as lpips_pkg  # type: ignore
    import torch

    net = lpips_pkg.LPIPS(net="vgg", spatial=False)
    w = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] \
        + [m for m in net.net.slice3] + [m for m in net.net.slice4] \
        + [m for m in net.net.slice5]
    conv_layers = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    assert len(conv_layers) == 13, len(conv_layers)
    for i, c in enumerate(conv_layers):
        w[f"conv{i}_w"] = c.weight.detach().numpy()     # OIHW
        w[f"conv{i}_b"] = c.bias.detach().numpy()
    for j, lin in enumerate(net.lins):
        w[f"lin{j}_w"] = lin.model[-1].weight.detach().numpy().reshape(-1)
    np.savez_compressed(out_path, **w)
    print(f"wrote {out_path}: {sorted(w)}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg16.npz")

"""Qualitative evaluation: 5-panel 3D renders of program graph + volumes.

Re-implements the reference visualization behavior
(`building_gan/src/trainer.py:52-289`): for a sampled building, draw (1) the
local program graph, (2) the irregular voxel grid, (3) ground-truth volumes,
(4) generated volumes with best-of-k z restarts scored by macro F1, and (5) a
program-type legend; stack several samples into one image strip for
TensorBoard.

Runs entirely on the host (matplotlib Agg); the only device work is the
generator forward per z restart.
"""

from __future__ import annotations

import io
from typing import Optional

import numpy as np

from ..config import COLORS, PROGRAM_NAMES, VOID
from ..data.batching import pack_one
from ..train.metrics import compute_metrics


def _voxel_faces(coord, dim):
    """12 quad faces of the box at coord (z, y, x) with dims (z, y, x)."""
    z, y, x = coord
    dz, dy, dx = dim
    v = [
        [x, y, z], [x + dx, y, z], [x + dx, y + dy, z], [x, y + dy, z],
        [x, y, z + dz], [x + dx, y, z + dz], [x + dx, y + dy, z + dz], [x, y + dy, z + dz],
    ]
    return [
        [v[0], v[1], v[2], v[3]],
        [v[4], v[5], v[6], v[7]],
        [v[0], v[1], v[5], v[4]],
        [v[2], v[3], v[7], v[6]],
        [v[1], v[2], v[6], v[5]],
        [v[0], v[3], v[7], v[4]],
    ]


def visualize_one(
    trainer,
    local_graph,
    voxel_graph,
    epoch: Optional[int],
    iteration: int = 1,
    show: bool = False,
    title: Optional[str] = None,
    to_pil: bool = False,
):
    """Render one building; best-of-``iteration`` z restarts by macro F1
    (reference trainer.py:52-194)."""
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from matplotlib.patches import Patch
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    cfg = trainer.configuration
    if cfg.LAYOUT == "grid":
        from ..data.grid import pack_grid

        batch = pack_grid([(local_graph, voxel_graph)], cfg, batch_slots=1)
        loc = voxel_graph.location.astype(int)
    else:
        batch = pack_one([(local_graph, voxel_graph)], cfg)
        loc = None
    n_real = voxel_graph.x.shape[0]

    best_f1 = 0.0
    types_generated = None
    key = jax.random.key(0)
    for it in range(max(iteration, 1)):
        _, label_hard, _ = trainer.generate(batch, jax.random.fold_in(key, it))
        pred_full = np.array(jnp.argmax(label_hard, axis=-1))
        if loc is not None:
            pred = pred_full[0, loc[:, 0], loc[:, 1], loc[:, 2]]
        else:
            pred = pred_full[:n_real]
        m = compute_metrics(
            jnp.array(voxel_graph.types),
            jnp.array(pred),
            jnp.ones(n_real),
            jnp.zeros(n_real, jnp.int32),
            jnp.ones(1),
        )
        f1 = float(m["f1"])
        if types_generated is None or f1 > best_f1:
            best_f1 = f1
            types_generated = pred

    fig = plt.figure(figsize=(20, 5))
    if title is not None:
        fig.suptitle(title, fontsize=16)

    ax_graph = fig.add_subplot(1, 5, 1, projection="3d")
    ax_grid = fig.add_subplot(1, 5, 2, projection="3d")
    ax_gt = fig.add_subplot(1, 5, 3, projection="3d")
    ax_gen = fig.add_subplot(1, 5, 4, projection="3d")
    ax_leg = fig.add_subplot(1, 5, 5, projection="3d")

    ax_graph.set_title("Graph\n")
    ax_grid.set_title(f"Irregular Voxel Grid (nodes: {n_real})\n")
    ax_gt.set_title("Ground Truth\n")
    ax_gen.set_title(f"{epoch}, Generated, (f1: {best_f1:.4f})\n")
    ax_leg.set_title("Legend\n")

    # program graph edges + nodes (centers are (z, y, x))
    centers = local_graph.center
    for s, t in local_graph.edge_index.T:
        zs, ys, xs = centers[s]
        zt, yt, xt = centers[t]
        ax_graph.plot([xs, xt], [ys, yt], [zs, zt], color="gray", alpha=0.3, linewidth=0.5)
    for li in range(centers.shape[0]):
        z, y, x = centers[li]
        ax_graph.scatter(x, y, z, c=COLORS[int(local_graph.types[li])], s=10)

    for ni in range(n_real):
        faces = _voxel_faces(voxel_graph.coordinate[ni], voxel_graph.dimension[ni])
        t_real = int(voxel_graph.types[ni])
        t_gen = int(types_generated[ni])

        grid = Poly3DCollection(faces, alpha=0.2)
        grid.set_facecolor("white")
        grid.set_edgecolor("gray")
        ax_grid.add_collection3d(grid)

        gt = Poly3DCollection(faces, alpha=0.035 if t_real == VOID else 1.0)
        gt.set_facecolor(COLORS[t_real])
        ax_gt.add_collection3d(gt)

        gen = Poly3DCollection(faces, alpha=0.035 if t_gen == VOID else 1.0)
        gen.set_facecolor(COLORS[t_gen])
        ax_gen.add_collection3d(gen)

    ax_leg.legend(
        handles=[
            Patch(facecolor=COLORS[p], label=PROGRAM_NAMES[p].replace("_", " ").title())
            for p in COLORS
        ],
        fontsize=7,
        frameon=False,
        loc="upper center",
    )

    maxc = (voxel_graph.coordinate + voxel_graph.dimension).max(axis=0)
    minc = voxel_graph.coordinate.min(axis=0)
    for ax in (ax_graph, ax_grid, ax_gt, ax_gen, ax_leg):
        ax.set_box_aspect([1, 1, 1])
        ax.set_proj_type("ortho")
        ax._axis3don = False
        ax.set_xlim(minc[2], maxc[2])
        ax.set_ylim(minc[1], maxc[1])
        ax.set_zlim(minc[0], maxc[0])

    if show:
        plt.show()

    if to_pil:
        from PIL import Image

        buf = io.BytesIO()
        fig.savefig(buf, format="png", bbox_inches="tight")
        plt.close(fig)
        buf.seek(0)
        return Image.open(buf)
    plt.close(fig)
    return None


def evaluate_qualitatively(
    trainer,
    epoch: Optional[int],
    iteration: int = 1,
    num_samples_to_viz: int = 2,
    to_tensor: bool = False,
    use_test_dataset: bool = False,
    show: bool = False,
):
    """Multi-sample image strip (reference trainer.py:196-289).

    Returns a CHW uint8 numpy array when ``to_tensor`` (TB ``add_image``
    format), else a PIL image.
    """
    import numpy as np

    rng = np.random.default_rng(0 if epoch is None else epoch)
    loaders = trainer.dataloaders
    train_samples = loaders.train_dataloader.samples
    if use_test_dataset and loaders.test_dataloader is not None:
        val_samples = loaders.test_dataloader.samples
        val_name = "test"
    elif loaders.validation_dataloader is not None:
        val_samples = loaders.validation_dataloader.samples
        val_name = "validation"
    else:
        val_samples = train_samples
        val_name = "train"

    figs = []
    for _ in range(num_samples_to_viz):
        if not use_test_dataset:
            ti = int(rng.integers(len(train_samples)))
            local, voxel = train_samples[ti]
            figs.append(
                visualize_one(
                    trainer, local, voxel, epoch, iteration,
                    title=None if epoch is None else f"train at epoch: {epoch}\n",
                    to_pil=True, show=show,
                )
            )
        vi = int(rng.integers(len(val_samples)))
        local, voxel = val_samples[vi]
        figs.append(
            visualize_one(
                trainer, local, voxel, epoch, iteration,
                title=None if epoch is None else f"{val_name} at epoch: {epoch}\n",
                to_pil=True, show=show,
            )
        )

    from PIL import Image

    width, height = figs[0].size
    merged = Image.new("RGB", (width, height * len(figs)))
    for i, f in enumerate(figs):
        merged.paste(f, (0, i * height))

    if to_tensor:
        arr = np.array(merged)
        return np.transpose(arr, (2, 0, 1)).astype(np.uint8)
    return merged

"""Analysis & visualization extras.

Re-design of ``medseg/analysis/`` (confusion_matrix.py:9-57 plot, UMAP
embedding plots visual_embedding.py:16-95, intensity distributions
vis_intensity_distribution.py:14-37) and the hard-example notebook
(visualization/vis_hard_example.ipynb): given a trained cooperative state,
extract z_i/z_s, run every masking method x threshold, and grid-plot the
generated corrupted images / segmentations + prediction-entropy maps
(the acceptance demo for the masking ops).

UMAP is not available in this image; ``plot_embedding`` falls back to
sklearn PCA/TSNE.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def plot_confusion_matrix(cm: np.ndarray, class_names: Sequence[str],
                          save_path: Optional[str] = None, normalize: bool = True):
    """Heatmap of a confusion matrix (analysis/confusion_matrix.py:9-57)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cm = np.asarray(cm, np.float64)
    if normalize:
        cm = cm / (cm.sum(axis=1, keepdims=True) + 1e-12)
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(cm, cmap="Blues")
    ax.set_xticks(range(len(class_names)), class_names, rotation=45)
    ax.set_yticks(range(len(class_names)), class_names)
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(j, i, f"{cm[i, j]:.2f}", ha="center", va="center",
                    color="white" if cm[i, j] > 0.5 else "black")
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    fig.colorbar(im)
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=100)
        plt.close(fig)
        return save_path
    return fig


def plot_embedding(features: np.ndarray, labels: np.ndarray,
                   save_path: Optional[str] = None, method: str = "pca"):
    """2-D embedding scatter of latent codes (analysis/visual_embedding.py:16-95);
    PCA/TSNE stand-in for UMAP."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    feats = np.asarray(features).reshape(len(features), -1)
    if method == "tsne":
        from sklearn.manifold import TSNE

        emb = TSNE(n_components=2, init="pca",
                   perplexity=min(30, max(2, len(feats) // 3))).fit_transform(feats)
    else:
        from sklearn.decomposition import PCA

        emb = PCA(n_components=2).fit_transform(feats)
    fig, ax = plt.subplots(figsize=(5, 5))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=np.asarray(labels), cmap="tab10", s=12)
    fig.colorbar(sc)
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=100)
        plt.close(fig)
        return save_path
    return fig


def plot_intensity_distributions(volumes: Dict[str, np.ndarray],
                                 save_path: Optional[str] = None, bins: int = 50):
    """Overlaid intensity histograms across domains
    (analysis/vis_intensity_distribution.py:14-37)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    for name, vol in volumes.items():
        ax.hist(np.asarray(vol).ravel(), bins=bins, density=True, alpha=0.5,
                label=name)
    ax.legend()
    ax.set_xlabel("intensity")
    ax.set_ylabel("density")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=100)
        plt.close(fig)
        return save_path
    return fig


def plot_image(data, ax=None, font_size: int = 12, title: str = "before"):
    """Grayscale 2-D image panel (vis.plot_image:49-63)."""
    return plot_general(data, ax=ax, font_size=font_size, title=title,
                        cmap="gray")


def plot_general(data, ax=None, font_size: int = 12, title: str = "",
                 cmap: str = "gray"):
    """Generic 2-D array panel (vis.plot_general:66-80)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        ax = plt.gca()
    ax.imshow(np.asarray(data), cmap=cmap)
    ax.set_title(title, size=font_size, weight="bold")
    ax.set_axis_off()
    ax.grid(False)
    return ax


def prediction_entropy(logits_nhwc) -> np.ndarray:
    """Per-pixel predictive entropy map (common_utils/uncertainty.py:7-54)."""
    p = jax.nn.softmax(jnp.asarray(logits_nhwc), axis=-1)
    ent = -jnp.sum(p * jnp.log(p + 1e-12), axis=-1)
    return np.asarray(ent / jnp.log(logits_nhwc.shape[-1]))


def visualize_hard_examples(solver, state, images_nhwc, labels_nhw, out_dir: str,
                            thresholds: Sequence[float] = (0.25, 0.5),
                            methods: Sequence[str] = ("dropout", "channel", "spatial"),
                            rng: Optional[jax.Array] = None):
    """Hard-example grids (vis_hard_example.ipynb cells 0-13): for every
    masking method x threshold, decode corrupted images from masked z_i and
    corrupted segmentations from masked z_s; save PNG grids + entropy maps."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from cooperative_training_and_latent_space_data_augmentation_tpu.ops.masking import (
        MaskSettings,
        perturb_latent_code,
    )

    os.makedirs(out_dir, exist_ok=True)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    images = jnp.asarray(images_nhwc)
    labels = jnp.asarray(labels_nhw)
    (z_i, z_s), y0, _ = solver.fast_predict(state.params, state.batch_stats,
                                            images, train=True)
    img_dec = solver._frozen_decoder_fn("image_decoder", state.params,
                                        state.batch_stats)
    seg_dec = solver._frozen_decoder_fn("segmentation_decoder", state.params,
                                        state.batch_stats)
    n_show = min(4, images.shape[0])
    paths = []
    def corrupt(z_i, z_s, images, labels, k1, k2, settings_i, settings_s):
        masked_zi, _ = perturb_latent_code(
            z_i, img_dec, images, k1, settings_i, solver.num_classes)
        masked_zs, _ = perturb_latent_code(
            z_s, seg_dec, labels, k2, settings_s, solver.num_classes)
        return img_dec(masked_zi), seg_dec(masked_zs)

    # MaskSettings are hashable static args; the frozen decoders (params +
    # batch stats of the state at entry) are closure constants baked into
    # the trace.  Eager grad-through-decoder masking is pathologically slow
    # on tunneled backends (op-by-op RPC dispatch), hence the jit.
    corrupt_jit = jax.jit(corrupt, static_argnames=("settings_i", "settings_s"))

    for method in methods:
        for thr in thresholds:
            rng, k1, k2 = jax.random.split(rng, 3)
            settings_i = MaskSettings(loss_name="mse", mask_type=method,
                                      max_threshold=thr, random_threshold=False,
                                      if_soft=True)
            settings_s = MaskSettings(loss_name="ce", mask_type=method,
                                      max_threshold=thr, random_threshold=False,
                                      if_soft=True)
            corrupted_img, corrupted_seg_logits = corrupt_jit(
                z_i, z_s, images, labels, k1, k2, settings_i, settings_s)
            ent = prediction_entropy(corrupted_seg_logits)
            fig, axes = plt.subplots(4, n_show, figsize=(2.4 * n_show, 9),
                                     squeeze=False)
            for i in range(n_show):
                axes[0][i].imshow(np.asarray(images)[i, :, :, 0], cmap="gray")
                axes[1][i].imshow(np.asarray(corrupted_img)[i, :, :, 0], cmap="gray")
                axes[2][i].imshow(np.argmax(np.asarray(corrupted_seg_logits)[i], -1),
                                  vmin=0, vmax=solver.num_classes - 1)
                axes[3][i].imshow(ent[i], cmap="magma")
                for r in range(4):
                    axes[r][i].axis("off")
            for r, title in enumerate(["input", "corrupted image",
                                       "corrupted seg", "entropy"]):
                # axis('off') suppresses ylabel rendering; draw row titles
                # as figure-level text instead.
                pos = axes[r][0].get_position()
                fig.text(0.02, (pos.y0 + pos.y1) / 2, title, rotation=90,
                         va="center", ha="center", fontsize=9)
            path = join(out_dir, f"hard_examples_{method}_thr{thr}.png")
            fig.suptitle(f"method={method} threshold={thr}")
            fig.savefig(path, bbox_inches="tight", dpi=80)
            plt.close(fig)
            paths.append(path)
    return paths

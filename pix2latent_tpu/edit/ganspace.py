"""GANSpace-style principal components of BigGAN's first feature layer.

Counterpart of the reference's ``pix2latent/edit/ganspace.py:5-66``
(Härkönen et al., "GANSpace: Discovering Interpretable GAN Controls",
arXiv:2004.02546 — quick-and-dirty variant, same warning applies): sample
gen_z features for many random z, PCA them, then solve the z-space directions
that produce those components. The reference SGD-solved the (convex)
least-squares because ``torch.lstsq`` was broken; we solve it in closed form.
PCA uses a randomized range finder (the ``torch.pca_lowrank`` algorithm) in
pure jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pca_lowrank(a, q=32, key=None, oversample=6, niter=2):
    """Randomized PCA: returns (s, v) — top-q singular values and right
    singular vectors of the centered ``a`` [n, d] (Halko et al. 2011 with
    ``niter`` subspace iterations — the torch.pca_lowrank algorithm)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n, d = a.shape
    mean = jnp.mean(a, axis=0, keepdims=True)
    a0 = a - mean
    g = jax.random.normal(key, (d, q + oversample), a.dtype)
    y = a0 @ g                                  # [n, q+p]
    qmat, _ = jnp.linalg.qr(y)
    for _ in range(niter):
        z, _ = jnp.linalg.qr(a0.T @ qmat)       # [d, q+p]
        qmat, _ = jnp.linalg.qr(a0 @ z)
    b = qmat.T @ a0                             # [q+p, d]
    _, s, vt = jnp.linalg.svd(b, full_matrices=False)
    return s[:q], vt[:q].T                      # [q], [d, q]


def biggan_components(model, class_lbl, num_components=32, num_samples=12800,
                      feat_size=128, key=None, batch=1024):
    """z-space principal directions for a fixed class.

    Args mirror the reference (``ganspace.py:5-27``); ``method`` is gone —
    the least-squares solve is exact here. Returns [num_components, 128],
    rows unit-norm.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_z, k_pca = jax.random.split(key)

    if isinstance(class_lbl, int):
        c = model.get_class_embedding(class_lbl)
    else:
        c = jnp.asarray(class_lbl)
    z = jax.random.normal(k_z, (num_samples, feat_size))
    c_rep = jnp.broadcast_to(c, (num_samples, c.shape[-1]))

    # first-layer features: gen_z(concat(z, c)) — computed in batches
    gen_z = model.params["gen_z"]

    @jax.jit
    def feats(z_b, c_b):
        cond = jnp.concatenate([z_b, c_b], axis=1)
        return cond @ gen_z["kernel"] + gen_z.get("bias", 0.0)

    chunks = [feats(z[i:i + batch], c_rep[i:i + batch])
              for i in range(0, num_samples, batch)]
    feat = jnp.concatenate(chunks, axis=0)

    _, v = pca_lowrank(feat, q=num_components, key=k_pca)
    x = (feat - jnp.mean(feat, axis=0, keepdims=True)) @ v   # [n, q]

    # exact least-squares: min_u ||z - x @ u.T||^2  (reference used 100 Adam
    # steps for the same convex problem, ganspace.py:43-60)
    u_t, *_ = jnp.linalg.lstsq(x, z)            # [q, feat_size]
    u = u_t                                      # rows are directions
    u = u / jnp.linalg.norm(u, axis=1, keepdims=True)
    return u

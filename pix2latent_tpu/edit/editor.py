"""Post-hoc latent editing of inversion results.

Counterpart of the reference's ``BigGANLatentEditor``
(``pix2latent/edit/editor.py:10-50``): load a saved inversion, pick the
best-loss sample, interpolate the class embedding or walk z-space GANSpace
components.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pix2latent_tpu.edit.ganspace import biggan_components
from pix2latent_tpu.variables import load_variables


class BigGANLatentEditor:

    def __init__(self, model=None):
        if model is None:
            from pix2latent_tpu.models.biggan import BigGAN
            model = BigGAN()
        self.model = model

    def load_result(self, var_path):
        """Load an inversion saved by ``save_variables`` and select the
        best-final-loss sample (reference ``editor.py:16-22``)."""
        payload = load_variables(var_path)
        variables = payload["variables"]
        raw_loss = payload.get("loss")
        assert raw_loss is not None, "saved payload has no 'loss' extra"
        loss = np.asarray(raw_loss)
        self._idx = int(np.argmin(loss.reshape(-1)))
        self._z = jnp.asarray(variables["input"]["z"][self._idx])[None]
        self._c = jnp.asarray(variables["input"]["c"][self._idx])[None]
        return self

    def edit_class(self, cls_idx, alpha=1.0):
        """c' = alpha*embed(new class) + (1-alpha)*c (``editor.py:24-32``)."""
        c_edit = self.model.get_class_embedding(cls_idx)
        c = alpha * c_edit + (1.0 - alpha) * self._c
        return self.model(z=self._z, c=c)[0]

    def edit_z(self, component, sigma):
        """Walk the ``component``-th GANSpace direction by ``sigma``
        (``editor.py:34-42``)."""
        if not hasattr(self, "components"):
            self.components = biggan_components(self.model, self._c)
        u = self.components[component:component + 1]
        return self.model(z=self._z + sigma * u, c=self._c)[0]

    def default(self):
        """Re-render the optimized result (``editor.py:45-50``)."""
        return self.model(z=self._z, c=self._c)[0]

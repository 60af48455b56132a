"""Abstract transform interface (reference ``transform/base_transform.py``)."""


class TransformTemplate:
    """A searchable image transform.

    Implementations are *pure* — ``__call__(ims, t, invert=False)`` returns a
    new array — so they can sit inside jitted steps and be differentiated
    (where the transform is differentiable).
    """

    def __call__(self, ims, t, invert=False):
        """Apply (or invert) the transformation parametrized by ``t``."""
        raise NotImplementedError

    def get_default_param(self):
        """Default (starting) transformation parameter."""
        raise NotImplementedError

    def get_identity_param(self):
        """Parameter at which the transform is the identity."""
        raise NotImplementedError

    def transform(self, ims, t):
        raise NotImplementedError

    def invert_transform(self, ims, t):
        raise NotImplementedError

from . import field, curve, mirrors

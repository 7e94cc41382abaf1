from . import params, limbs

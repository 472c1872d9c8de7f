from . import cell, core, params
from .cmps import CMPS, PsiCMPS, RhoCMPS

__all__ = ["cell", "core", "params", "CMPS", "PsiCMPS", "RhoCMPS"]

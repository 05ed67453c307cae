"""Drift detectors (importing registers them in DetectorRegistry)."""

from driftspark.detectors.base import BaseDriftDetector
from driftspark.detectors.cbpe import CBPE
from driftspark.detectors.ks import KSTest
from driftspark.detectors.psi import PSI

__all__ = ["BaseDriftDetector", "KSTest", "PSI", "CBPE"]

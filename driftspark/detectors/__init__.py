"""Drift detectors (importing registers them in DetectorRegistry)."""

from driftspark.detectors.base import BaseDriftDetector
from driftspark.detectors.cbpe import CBPE
from driftspark.detectors.correlation import CorrelationDrift
from driftspark.detectors.domain_classifier import DomainClassifier
from driftspark.detectors.gof import CvMAndersonDarling
from driftspark.detectors.hallucination import HallucinationRiskDetector
from driftspark.detectors.ks import KSTest
from driftspark.detectors.mmd import MMD
from driftspark.detectors.psi import PSI
from driftspark.detectors.wasserstein import WassersteinDistance

__all__ = [
    "BaseDriftDetector",
    "KSTest",
    "PSI",
    "CBPE",
    "MMD",
    "DomainClassifier",
    "HallucinationRiskDetector",
    "WassersteinDistance",
    "CvMAndersonDarling",
    "CorrelationDrift",
]

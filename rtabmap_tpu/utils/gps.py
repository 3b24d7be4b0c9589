"""GPS / geodetic conversions + pose-graph GPS priors.

Capability parity: the reference's ``GeodeticCoords``
(/root/reference/corelib/src/GeodeticCoords.cpp — WGS84 geodetic ->
geocentric (ECEF) -> local ENU conversions) and the GPS prior factors the
optimizers consume (OptimizerG2O.cpp:634-685 XYZ prior edges).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_WGS84_E2 = _WGS84_F * (2.0 - _WGS84_F)


@dataclass
class GPS:
    stamp: float = 0.0
    longitude: float = 0.0
    latitude: float = 0.0
    altitude: float = 0.0
    error: float = 0.0     # meters (horizontal std)
    bearing: float = 0.0   # degrees


def geodetic_to_ecef(lat_deg: float, lon_deg: float, alt: float) -> np.ndarray:
    lat = np.radians(lat_deg)
    lon = np.radians(lon_deg)
    N = _WGS84_A / np.sqrt(1.0 - _WGS84_E2 * np.sin(lat) ** 2)
    x = (N + alt) * np.cos(lat) * np.cos(lon)
    y = (N + alt) * np.cos(lat) * np.sin(lon)
    z = (N * (1.0 - _WGS84_E2) + alt) * np.sin(lat)
    return np.array([x, y, z])


def ecef_to_enu(ecef: np.ndarray, ref_lat_deg: float, ref_lon_deg: float,
                ref_alt: float) -> np.ndarray:
    lat = np.radians(ref_lat_deg)
    lon = np.radians(ref_lon_deg)
    ref = geodetic_to_ecef(ref_lat_deg, ref_lon_deg, ref_alt)
    d = ecef - ref
    R = np.array([
        [-np.sin(lon), np.cos(lon), 0.0],
        [-np.sin(lat) * np.cos(lon), -np.sin(lat) * np.sin(lon), np.cos(lat)],
        [np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)],
    ])
    return R @ d


def geodetic_to_enu(gps: GPS, origin: GPS) -> np.ndarray:
    """GPS fix -> local ENU meters relative to the first fix
    (reference: GeodeticCoords::toENU_WGS84)."""
    return ecef_to_enu(
        geodetic_to_ecef(gps.latitude, gps.longitude, gps.altitude),
        origin.latitude, origin.longitude, origin.altitude,
    )


def gps_prior_factors(fixes, origin: Optional[GPS] = None):
    """(node_id, GPS) list -> (node_id, xyz ENU, information 3x3) priors for
    the pose graph (reference: gravity/GPS prior edges)."""
    if not fixes:
        return []
    origin = origin or fixes[0][1]
    out = []
    for nid, g in fixes:
        enu = geodetic_to_enu(g, origin)
        var = max(g.error, 0.5) ** 2
        out.append((nid, enu, np.eye(3) / var))
    return out

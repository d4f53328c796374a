"""Analytic model cases (the reference's ROMS/Include/<app>.h +
ROMS/Functionals/ana_*.h fixtures, re-expressed as Python builders)."""

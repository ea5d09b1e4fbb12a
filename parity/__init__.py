"""Head-to-head parity harness against the reference framework.

``parity.refbridge`` makes `/root/reference/src` importable in-image (shimming
``pkg_resources`` and the ``dependencies`` DI package); ``parity.run_parity``
trains the same topologies on the same data at the same bit-widths in both
frameworks and reports the top-1 delta (see PARITY.md).
"""

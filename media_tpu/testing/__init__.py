"""Test-support utilities (conformance oracles, stream generators).

Nothing here is on the product path; the package exists so the test suite
can validate media_tpu bitstreams against independent third-party codecs.
"""

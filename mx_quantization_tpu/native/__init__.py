"""Native (C++) runtime components: batch image decoder, bit-exact scalar
quantizer oracle.  Built lazily with g++ on first use; .so cached next to
the sources."""

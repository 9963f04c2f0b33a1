"""Scalar function kits: geo (haversine/OLC/tiles), geometry
(mercator, polygons, Douglas-Peucker), text (name-match cascade +
SQL mirrors), hashing (shingles, minhash, simhash, fingerprints)."""

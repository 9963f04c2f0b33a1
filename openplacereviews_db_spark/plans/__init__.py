"""Query plans: each module exposes QUERIES (name -> (spark, sf_dir)
-> DataFrame) and ORACLES (name -> DuckDB SQL), aggregated by
/root/repo/__spark_entry__.py."""

"""Static public-data assets (Ensembl sequence-ontology tables)."""

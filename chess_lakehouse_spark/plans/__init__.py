"""Pipeline plans: stage assembly mirroring the reference's DVC DAG."""

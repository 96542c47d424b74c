"""CLI front-end replicating the reference's command grammar and flag types."""

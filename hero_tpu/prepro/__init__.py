"""Preprocessing (the reference's ``scripts/`` layer): subtitle↔frame
alignment, feature-db conversion, query/caption tokenization — emitting
herostore dbs with the reference's sidecar JSON contract."""

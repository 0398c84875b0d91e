"""Model components: encoder, decoder, CTC head, and assembly."""

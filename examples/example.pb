
‹
example.proto"ù
ExampleMessage
name (	
type (2.MessageType-
	timestamp (2.google.protobuf.Timestamp
value ('
tags (2.ExampleMessage.TagsEntry
labels (	+
	TagsEntry
key (	
value (	:8:Šµdefault.example_table
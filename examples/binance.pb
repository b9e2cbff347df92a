
˜
binance.proto"†
Trade
	eventType (	Re
	eventTime (RE
symbol (	Rs
tradeID (Rt
price (Rp
quantity (Rq

buyOrderID (Rb
sellOrderID (Ra
	tradeTime	 (RT
marketMaker
 (Rm
M (RM:Šµbinance.trade_events